#!/usr/bin/env python
"""Serving-config A/B on the real TPU: trained ssdlite320 weights + real
val frames through the fused postprocess, sweeping trunk layout knobs.

The shipped serving row (bench.py trained_fused_bf16_b128) runs the BASE
bf16 trunk; DESIGN.md "Round 4" puts it at ~63% of the bf16 analytic
speed-of-light, i.e. there are bytes left on the table in the early
trunk. The two exact-layout transforms that bought the training step its
win (ops/lane_pack.py lane-packed early blocks; the space-to-depth stem)
apply unchanged at inference — variable tree identical, so the same
trained checkpoint loads — and this tool measures whether either (or
both) moves the serving number:

    python tools/bench_serving.py                 # b128 bf16 sweep
    python tools/bench_serving.py --batch 64 --dtype fp32

Sanity gate per variant: detections must match the base trunk's to
serving tolerance (labels/valid exact on >=99.9% of slots, scores
allclose) — the trunk transforms are exact in exact arithmetic but
reassociate conv sums, so bf16 outputs can differ in ulps; a real
mismatch (layout bug) would blow far past the gate.
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

WARMUP = 3
ITERS = 20
N_BUFFERS = 3


def _sync(result) -> None:
    leaf = jax.tree_util.tree_leaves(result)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def make_fn(dtype, lane_pack, stem_s2d, impl):
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large
    from demonet_tpu.models.detection import (
        postprocess_detections, preprocess)

    det = ssdlite320_mobilenet_v3_large(
        num_classes=91, dtype=dtype, lane_pack=lane_pack, stem_s2d=stem_s2d)
    anchors = jnp.asarray(det.anchors)

    def f(variables, images):
        x = preprocess(images, det.config, resize=False)
        out = det.model.apply(variables, x, train=False)
        return postprocess_detections(
            out["cls_logits"], out["bbox_regression"], anchors,
            det.config, impl=impl)

    return jax.jit(f)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", choices=("bf16", "fp32"), default="bf16")
    p.add_argument("--impl", default="fused")
    args = p.parse_args()

    assert jax.default_backend() == "tpu", jax.default_backend()
    from tools.export_bench_images import load_bench_images
    from tools.export_bench_weights import load_bench_variables

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    tv = jax.device_put(load_bench_variables(
        "bench_assets/ssdlite320_shapes_trained.npz"))
    arr = load_bench_images("bench_assets/val_images_320.npz", 192)
    idx = np.arange(N_BUFFERS * args.batch) % len(arr)
    bufs = [jnp.asarray(arr[idx[i * args.batch:(i + 1) * args.batch]])
            for i in range(N_BUFFERS)]
    jax.block_until_ready(bufs)

    variants = [
        ("base", dict(lane_pack=False, stem_s2d=False)),
        ("lane_pack", dict(lane_pack=True, stem_s2d=False)),
        ("stem_s2d", dict(lane_pack=False, stem_s2d=True)),
        ("lane_pack+s2d", dict(lane_pack=True, stem_s2d=True)),
    ]
    base_out = None
    rc = 0
    for name, kw in variants:
        f = make_fn(dtype, impl=args.impl, **kw)
        out = f(tv, bufs[0])
        _sync(out)
        if base_out is None:
            base_out = jax.device_get(out)
        else:
            o = jax.device_get(out)
            slots = o["labels"].size
            lab_eq = np.mean((o["labels"] == base_out["labels"])
                             & (o["valid"] == base_out["valid"]))
            sc = np.abs(o["scores"] - base_out["scores"]).max()
            ok = lab_eq >= 0.999 and sc < 1e-2
            if not ok:
                rc = 1
            print(f"  [{name}] vs base: label/valid match "
                  f"{lab_eq:.6f} of {slots}, max|dscore| {sc:.2e} "
                  f"{'OK' if ok else 'MISMATCH'}")
        for i in range(WARMUP):
            out = f(tv, bufs[i % N_BUFFERS])
        _sync(out)
        t0 = time.perf_counter()
        for i in range(ITERS):
            out = f(tv, bufs[i % N_BUFFERS])
        _sync(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:16s} {args.dtype} b{args.batch} {args.impl}: "
              f"{dt * 1e3:7.2f} ms/b  ({args.batch / dt:7.1f} img/s)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
