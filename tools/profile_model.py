"""Capture a device profile of the inference or training step.

The reference's "profiling" is manual wall-clock meters (engine.py:90-100,
misc.py:186-221); the TPU-native tool is an XLA trace viewable in
TensorBoard/XProf (SURVEY.md §5 "Rebuild hook: jax.profiler traces").

    python tools/profile_model.py --mode predict --batch-size 64 \
        --logdir /tmp/trace
    tensorboard --logdir /tmp/trace   # -> Profile tab
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from demonet_tpu.engine import (
        create_train_state, make_lr_schedule, make_optimizer,
        make_predict_step, make_train_step)
    from demonet_tpu.models import get_model

    model_kw = {}
    if args.bf16:
        model_kw["dtype"] = jnp.bfloat16
    if args.lane_pack:
        model_kw["lane_pack"] = True
    det = get_model(args.model, num_classes=args.num_classes, **model_kw)
    variables = det.init(jax.random.PRNGKey(0))
    b = args.batch_size
    h, w = det.config.size
    images = jnp.asarray(np.random.RandomState(0).rand(b, h, w, 3),
                         jnp.float32)

    if args.mode == "predict":
        step = make_predict_step(det)
        run = lambda: step(variables, images, None)  # noqa: E731
    else:
        tx = make_optimizer(make_lr_schedule(0.02, 100))
        state = create_train_state(det, jax.random.PRNGKey(0), tx)
        tstep = make_train_step(det, donate=False)
        batch = {
            "images": images,
            "gt_boxes": jnp.tile(jnp.asarray(
                [[[20.0, 20.0, 120.0, 120.0]]]), (b, 1, 1)),
            "gt_labels": jnp.full((b, 1), 1, jnp.int32),
            "gt_valid": jnp.ones((b, 1), bool),
        }

        def run():
            nonlocal state
            state, m = tstep(state, batch)
            return m

    jax.block_until_ready(run())  # compile outside the trace
    with jax.profiler.trace(args.logdir):
        for _ in range(args.iters):
            out = run()
        jax.block_until_ready(out)
    print(f"trace written to {args.logdir}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ssdlite320_mobilenet_v3_large")
    p.add_argument("--num-classes", type=int, default=91)
    p.add_argument("--mode", choices=["predict", "train"], default="predict")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--lane-pack", dest="lane_pack", action="store_true")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--logdir", default="/tmp/demonet_trace")
    sys.exit(main(p.parse_args()))
