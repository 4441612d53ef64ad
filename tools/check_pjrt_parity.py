"""Compare the C++ PJRT runner's dumped outputs with Python on the same input.

Flow (the reference's libtorch tracing test run end-to-end,
/root/reference/test/tracing/test_demonet_tracing.cpp:17-57). The input
MUST be the same fixed random image on both sides — step 2 writes it,
the runner reads it via input_file= (zeros would tie every score and
leave the box order unspecified):

    python -m demonet_tpu.export.cli --model ssdlite320_mobilenet_v3_large \
        --output /tmp/m.bin --mlir /tmp/m.mlir
    python tools/check_pjrt_parity.py /tmp/m.bin /tmp/pjrt_out --make-input
    AXON_POOL_SVC_OVERRIDE=127.0.0.1 TPU_WORKER_HOSTNAMES=localhost \
      cpp/build/pjrt_runner /opt/axon/libaxon_pjrt.so /tmp/m.mlir \
        1x320x320x3 5 /tmp/m.mlir.compile_opts.pb dump_out=/tmp/pjrt_out \
        input_file=/tmp/pjrt_in.bin \
        topology=v5e:1x1x1 session_id=$(uuidgen) remote_compile=1 \
        local_only=0 priority=0 n_slices=1
    python tools/check_pjrt_parity.py /tmp/m.bin /tmp/pjrt_out

This script then calls the same exported artifact on the same input
through jax.export and asserts every flattened output matches the dump.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    exported_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ssdlite320.bin"
    dump_prefix = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pjrt_out"
    input_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/pjrt_in.bin"
    make_input_only = "--make-input" in sys.argv

    import jax
    import jax.numpy as jnp

    from demonet_tpu.export.stablehlo import load_exported

    exported = load_exported(exported_path)
    n, h, w, c = exported.in_avals[0].shape
    if "--real-frames" in sys.argv:
        # real val frames (bench asset): with TRAINED weights these have
        # sparse above-threshold scores, so a fused-postprocess artifact
        # exercises its FAST branch rather than the dense fallback
        from tools.export_bench_images import load_bench_images

        x = np.ascontiguousarray(load_bench_images(
            "bench_assets/val_images_320.npz", n).astype(np.float32))
        assert x.shape == (n, h, w, c), (x.shape, (n, h, w, c))
    else:
        # deterministic non-trivial input: zeros would tie every score and
        # make the sort order (hence box order) unspecified between
        # compilations
        x = np.random.default_rng(0).random((n, h, w, c)).astype(np.float32)
    x.tofile(input_path)
    if make_input_only:
        print(f"wrote {input_path} ({x.nbytes} bytes, {x.shape})")
        return
    out = exported.call(jnp.asarray(x))
    leaves = jax.tree_util.tree_leaves(out)
    print(f"python outputs: {[(l.shape, str(l.dtype)) for l in leaves]}")

    ok = True
    for i, leaf in enumerate(leaves):
        path = f"{dump_prefix}.{i}.bin"
        raw = np.fromfile(path, dtype=leaf.dtype).reshape(leaf.shape)
        ref = np.asarray(leaf)
        match = np.allclose(raw, ref, rtol=1e-5, atol=1e-5)
        max_abs = float(np.max(np.abs(raw.astype(np.float64)
                                      - ref.astype(np.float64)))) \
            if raw.size else 0.0
        print(f"output[{i}] {path}: shape={ref.shape} dtype={ref.dtype} "
              f"max|diff|={max_abs:.3e} -> {'OK' if match else 'MISMATCH'}")
        ok &= match
    if not ok:
        sys.exit(1)
    print("PARITY OK: C++ PJRT runner outputs match Python jax.export.call")


if __name__ == "__main__":
    main()
