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
        for b in args.batch:
            print(f"=== {name} b{b}{' bf16' if args.bf16 else ''} ===")
            rc |= check_model(name, b, args)
    return rc


def check_model(model_name: str, b: int, args) -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    from demonet_tpu.models import get_model
    from demonet_tpu.models.detection import (
        postprocess_detections, preprocess)

    kw = {"dtype": jnp.bfloat16} if args.bf16 else {}
    det = get_model(model_name, num_classes=91, **kw)
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
    n_bufs = max(2, min(3, len(arr) // b)) if b <= len(arr) else 2
    # cycle the frame pool when b doesn't divide it (e.g. b128 over the
    # 192-frame asset): distinct buffers, every frame real
    idx = np.arange(n_bufs * b) % len(arr)
    bufs = [jnp.asarray(arr[idx[i * b:(i + 1) * b]]) for i in range(n_bufs)]
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

    # Equality gate: ONE program computes the trunk once and feeds both
    # postprocess impls — the fast path's contract is postprocess
    # equality GIVEN the logits. Two separately-jitted programs can
    # compile the trunk with different fusion rounding (observed with
    # --bf16: threshold-straddling scores flip between programs), which
    # would test compiler determinism, not the fused path.
    def both(variables, images):
        x = preprocess(images, det.config, resize=False)
        out = det.model.apply(variables, x, train=False)
        a = (out["cls_logits"], out["bbox_regression"], anchors, det.config)
        return (postprocess_detections(*a, impl="reference"),
                postprocess_detections(*a, impl="fused"))

    jboth = jax.jit(both)

    ok = True
    for i, buf in enumerate(bufs):
        ref, fus = jax.device_get(jboth(v, buf))
        # BITWISE gate in BOTH regimes (trained fast branch AND dense
        # random-weights fallback branch): since round 4 every shared
        # float quantity (softmax scores, decoded+clipped boxes) is
        # hoisted OUT of the lax.switch to the program top level, so the
        # fallback branch and the reference pipeline consume identical
        # inputs and the branches are pure gather/sort/compare. The
        # round-3 tolerance carve-out (1-ulp branch-compilation score
        # rounding, tools/diag_fused_mismatch.py) is fixed at the source,
        # not excused here.
        val_eq = bool((ref["valid"] == fus["valid"]).all())
        sc_eq = lb_eq = bx_eq = False
        if val_eq:
            m = ref["valid"]
            sc_eq = bool((ref["scores"][m] == fus["scores"][m]).all())
            lb_eq = bool((ref["labels"][m] == fus["labels"][m]).all())
            bx_eq = bool((ref["boxes"][m] == fus["boxes"][m]).all())
        n = int(ref["valid"].sum())
        strict = val_eq and sc_eq and lb_eq and bx_eq
        print(f"batch {i}: dets={n} valid_eq={val_eq} scores_eq={sc_eq} "
              f"labels_eq={lb_eq} boxes_eq={bx_eq}")
        ok &= strict

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
    p.add_argument("--batch", type=int, nargs="+", default=[64])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 trunk (postprocess stays fp32 per the "
                        "precision policy); both impls see the same logits, "
                        "so the equality gates are unchanged")
    sys.exit(main(p.parse_args()))
