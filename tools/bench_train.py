"""Measure train-step throughput across the perf knobs.

Configs: precision (fp32/bf16) x lane-pack x steps-per-call. Each sample is
a full optimizer step (forward, matching, loss, backward, SGD update, BN
update) at the given batch size; steps-per-call K runs K steps as ONE
lax.scan dispatch (engine/train.py::make_train_step) so per-dispatch host
latency — several ms through a tunneled PJRT runtime — is amortized.

Honesty: distinct random batches per scan substep and cycling device
buffers between dispatches; timing barrier is a tiny D2H fetch of the
final state (block_until_ready alone can return early through the tunnel —
STATUS.md). The scan carry makes substeps data-dependent, so XLA cannot
collapse repeated work the way an inference scan over identical inputs
could.

    python tools/bench_train.py --bf16 --lane-pack --spc 1 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from demonet_tpu.engine import (
        create_train_state, make_lr_schedule, make_optimizer, make_train_step)
    from demonet_tpu.models import get_model

    model_kw = {}
    if args.bf16:
        model_kw["dtype"] = jnp.bfloat16
    if args.lane_pack:
        model_kw["lane_pack"] = True
    det = get_model(args.model, num_classes=args.num_classes, **model_kw)
    b = args.batch_size
    h, w = det.config.size
    rng = np.random.default_rng(0)

    def make_batch(k=None):
        lead = (b,) if k is None else (k, b)
        images = rng.random(lead + (h, w, 3), np.float32)
        if args.u8:
            images = np.clip(np.rint(images * 255.0), 0, 255).astype(np.uint8)
        lo = rng.uniform(0, w / 2, lead + (1, 2))
        hi = rng.uniform(w / 2, w, lead + (1, 2))
        boxes = np.concatenate([lo, hi], axis=-1).astype(np.float32)
        return jax.device_put({
            "images": images,
            "gt_boxes": boxes,
            "gt_labels": np.full(lead + (1,), 1, np.int32),
            "gt_valid": np.ones(lead + (1,), bool),
        })

    tx = make_optimizer(make_lr_schedule(0.02, 100))

    def sync(state):
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(state.params)[0].ravel()[0]))

    results = {}
    for spc in args.spc:
        step = make_train_step(det, steps_per_call=spc)
        state = create_train_state(det, jax.random.PRNGKey(0), tx)
        k = None if spc == 1 else spc
        buffers = [make_batch(k) for _ in range(args.buffers)]
        state, _ = step(state, buffers[0])  # compile
        sync(state)
        for i in range(args.warmup):
            state, _ = step(state, buffers[i % args.buffers])
        sync(state)
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, _ = step(state, buffers[i % args.buffers])
        sync(state)
        dt = (time.perf_counter() - t0) / (args.iters * spc)
        results[spc] = dt
        print(f"spc={spc:3d}: {dt * 1e3:7.3f} ms/step  "
              f"{b / dt:8.1f} img/s "
              f"(bf16={args.bf16} lane_pack={args.lane_pack} u8={args.u8})",
              flush=True)
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ssdlite320_mobilenet_v3_large")
    p.add_argument("--num-classes", type=int, default=91)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--lane-pack", dest="lane_pack", action="store_true")
    p.add_argument("--u8", action="store_true",
                   help="ship uint8 images (loader image_dtype=uint8 path)")
    p.add_argument("--spc", type=int, nargs="+", default=[1, 8],
                   help="steps-per-call values to measure")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--buffers", type=int, default=2)
    sys.exit(main(p.parse_args()))
