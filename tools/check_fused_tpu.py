#!/usr/bin/env python
"""Fused trained-model postprocess on real TPU: output equality with the
reference pipeline plus e2e timings for both paths. Companion to
tests/test_postprocess_fused.py (CPU equality on synthetic cases +
every family's real config).

Default: ssdlite320 with the ROUND-3 TRAINED weights + real val frames
(bench assets) — realistic score sparsity. --model <other family> runs
random weights + random frames (no trained checkpoint exists for those):
equality still must hold (the fused path is exact-by-construction with a
counted fallback), but the timing shows the dense-candidate regime.

    python tools/check_fused_tpu.py                  # trained, b64 + b1
    python tools/check_fused_tpu.py --model ssd300_vgg16,pelee304
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(args) -> int:
    # --model accepts a comma-separated list: backend init through the
    # device tunnel costs minutes, so verifying several families in one
    # process amortizes the handshake.
    rc = 0
    for name in args.model.split(","):
        print(f"=== {name} ===")
        rc |= check_model(name, args)
    return rc


def _set_match_ok(ref, fus, batch, tol=1e-5) -> bool:
    """Order-insensitive per-image detection match (fallback regime):
    greedily pair each fused det with an unused ref det of the same
    label, |dscore| <= tol, box within atol 1e-3. True iff every det of
    every image pairs up."""
    for i in range(batch):
        m = ref["valid"][i]
        rs, fs = ref["scores"][i][m], fus["scores"][i][m]
        rl, fl = ref["labels"][i][m], fus["labels"][i][m]
        rb, fb = ref["boxes"][i][m], fus["boxes"][i][m]
        used = np.zeros(len(rs), bool)
        for p in range(len(fs)):
            cand = np.nonzero(
                ~used & (rl == fl[p]) & (np.abs(rs - fs[p]) <= tol)
                & (np.abs(rb - fb[p]).max(axis=-1)
                   <= 1e-3 + 1e-5 * np.abs(fb[p]).max()))[0]
            if not len(cand):
                return False
            used[cand[0]] = True
    return True


def check_model(model_name: str, args) -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    from demonet_tpu.models import get_model
    from demonet_tpu.models.detection import (
        postprocess_detections, preprocess)

    det = get_model(model_name, num_classes=91)
    h, w = det.config.size
    trained = model_name == "ssdlite320_mobilenet_v3_large" and os.path.exists(
        "bench_assets/ssdlite320_shapes_trained.npz")
    if trained:
        from tools.export_bench_images import load_bench_images
        from tools.export_bench_weights import load_bench_variables

        v = jax.device_put(load_bench_variables(
            "bench_assets/ssdlite320_shapes_trained.npz"))
        arr = load_bench_images("bench_assets/val_images_320.npz", 192)
        print("weights: round-3 trained checkpoint; inputs: real val frames")
    else:
        v = jax.device_put(det.init(jax.random.PRNGKey(0)))
        arr = np.random.default_rng(0).random((192, h, w, 3), np.float32)
        print(f"weights: random init; inputs: random frames ({model_name})")
    b = args.batch
    n_bufs = max(2, min(3, len(arr) // b))
    bufs = [jnp.asarray(arr[i * b:(i + 1) * b]) for i in range(n_bufs)]
    anchors = jnp.asarray(det.anchors)

    def fwd(impl):
        def f(variables, images):
            x = preprocess(images, det.config, resize=False)
            out = det.model.apply(variables, x, train=False)
            return postprocess_detections(
                out["cls_logits"], out["bbox_regression"], anchors,
                det.config, impl=impl)
        return jax.jit(f)

    jr, jf = fwd("reference"), fwd("fused")

    ok = True
    for i, buf in enumerate(bufs):
        ref = jax.device_get(jr(v, buf))
        fus = jax.device_get(jf(v, buf))
        val_eq = bool((ref["valid"] == fus["valid"]).all())
        m = ref["valid"]
        # scores: the trained path exercises the fused FAST branch, which
        # is exact-by-construction -> gate on bitwise equality there. On
        # random weights the candidates are dense and the lax.cond
        # FALLBACK branch executes; XLA may compile that in-program copy
        # of the reference pipeline with different fusion rounding than
        # the standalone reference program (~1e-7), so gate on a tight
        # allclose and report exactness separately.
        sc_eq = bool((ref["scores"][m] == fus["scores"][m]).all())
        sc_close = bool(np.allclose(ref["scores"][m], fus["scores"][m],
                                    rtol=1e-5, atol=1e-7))
        lb_eq = bool((ref["labels"][m] == fus["labels"][m]).all())
        bx_close = bool(np.allclose(ref["boxes"][m], fus["boxes"][m],
                                    rtol=1e-5, atol=1e-3))
        n = int(m.sum())
        # Fallback regime only (random weights): the cond fallback branch
        # can round scores one ulp differently from the standalone
        # reference program (measured max 6e-8 — tools/diag_fused_mismatch
        # .py, ssd512_vgg16), so NEAR-TIED detections may swap adjacent
        # ranks. Gate position mismatches with a tolerance-aware per-image
        # set match: every fused det must pair with an unused ref det of
        # the same label, |dscore| <= 1e-5 and close box.
        set_ok = True
        if not (lb_eq and bx_close):
            set_ok = _set_match_ok(ref, fus, b)
        print(f"batch {i}: dets={n} valid_eq={val_eq} scores_eq={sc_eq} "
              f"scores_close={sc_close} labels_eq={lb_eq} "
              f"boxes_close={bx_close}"
              + ("" if lb_eq and bx_close else f" set_match_ok={set_ok}"))
        ok &= val_eq and (sc_eq if trained else sc_close) and \
            ((lb_eq and bx_close) if trained else set_ok)

    def _sync(out):
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(out)[0].ravel()[0]))

    print(f"--- e2e b{b} timing ---")
    for f, label in ((jr, "reference"), (jf, "fused")):
        for i in range(3):
            out = f(v, bufs[i % n_bufs])
        _sync(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = f(v, bufs[i % n_bufs])
        _sync(out)
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{label}: pipelined {dt:.2f} ms/b ({b / dt * 1000:.0f} img/s)",
              end="  ")
        lats = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            _sync(f(v, bufs[i % n_bufs]))
            lats.append(time.perf_counter() - t0)
        lats.sort()
        print(f"blocking p50 {lats[len(lats) // 2] * 1000:.2f} ms")

    print("ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ssdlite320_mobilenet_v3_large")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    sys.exit(main(p.parse_args()))
