#!/usr/bin/env python
"""Composed train-step timing for the lane-packed early trunk
(ops/lane_pack.py) on the real TPU: ssdlite320 b64 grad step, fp32 and
bf16, lane_pack off/on (+ optional 256-lane variant). The directive-4
measurement: DESIGN.md "Training-step profile" attributes ~25 ms of the
53.7 ms fp32 step to the under-filled early blocks."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def make_step(lane_pack, dtype, max_lanes=128, stem_s2d=False):
    from demonet_tpu.engine import (
        create_train_state, make_lr_schedule, make_optimizer, make_train_step)
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large

    det = ssdlite320_mobilenet_v3_large(
        num_classes=91, dtype=dtype, lane_pack=lane_pack,
        lane_pack_max_lanes=max_lanes, stem_s2d=stem_s2d)
    tx = make_optimizer(make_lr_schedule(0.02, steps_per_epoch=1000))
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    step = make_train_step(det, donate=True)
    return state, step


def bench(name, lane_pack, dtype, max_lanes=128, iters=20, batch=64,
          stem_s2d=False):
    state, step = make_step(lane_pack, dtype, max_lanes, stem_s2d)
    rng = np.random.default_rng(0)
    batches = []
    for i in range(3):
        batches.append({
            "images": jnp.asarray(rng.random((batch, 320, 320, 3), np.float32)),
            "gt_boxes": jnp.asarray(rng.random((batch, 8, 4), np.float32) * 320),
            "gt_labels": jnp.asarray(rng.integers(1, 91, (batch, 8)), jnp.int32),
            "gt_valid": jnp.ones((batch, 8), bool),
        })
    # fix degenerate boxes
    for b in batches:
        x1 = jnp.minimum(b["gt_boxes"][..., :2], b["gt_boxes"][..., 2:] - 1)
        b["gt_boxes"] = jnp.concatenate([x1, x1 + 32.0], axis=-1)

    state, metrics = step(state, batches[0])  # compile
    np.asarray(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batches[i % 3])
    np.asarray(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.2f} ms/step  ({batch / dt * 1000:.0f} img/s)")
    return dt


def main() -> int:
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--stem-s2d", action="store_true",
                        help="A/B the space-to-depth stem (with/without, "
                             "on top of base and lane_pack(128)) instead "
                             "of the lane-pack sweep")
    args = parser.parse_args()
    assert jax.default_backend() == "tpu", jax.default_backend()
    results = {}
    if args.stem_s2d:
        for dtype_name, dtype in (("fp32", jnp.float32),
                                  ("bf16", jnp.bfloat16)):
            for lp in (False, True):
                lp_name = "lane_pack(128)" if lp else "base"
                for s2d in (False, True):
                    name = f"{dtype_name} {lp_name}" + \
                        (" +stem_s2d" if s2d else "")
                    results[name] = bench(name, lp, dtype, stem_s2d=s2d)
        print(results)
        return 0
    for dtype_name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        results[f"{dtype_name} base"] = bench(
            f"{dtype_name} base", False, dtype)
        results[f"{dtype_name} packed128"] = bench(
            f"{dtype_name} lane_pack(128)", True, dtype)
        results[f"{dtype_name} packed256"] = bench(
            f"{dtype_name} lane_pack(256)", True, dtype, max_lanes=256)
    print(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
