"""Capture a device profile of the inference or training step.

The reference's "profiling" is manual wall-clock meters (engine.py:90-100,
misc.py:186-221); the TPU-native tool is an XLA trace viewable in
TensorBoard/XProf (SURVEY.md §5 "Rebuild hook: jax.profiler traces").

    python tools/profile_model.py --mode predict --batch-size 64 \
        --logdir /tmp/trace
    tensorboard --logdir /tmp/trace   # -> Profile tab

The shipped serving config (trained weights, real val frames, bf16
trunk, fused postprocess — the bench.py trained_fused_bf16_b128 row):

    python tools/profile_model.py --mode predict --batch-size 128 \
        --bf16 --impl fused \
        --npz-weights bench_assets/ssdlite320_shapes_trained.npz \
        --frames bench_assets/val_images_320.npz --logdir /tmp/serve
    python tools/trace_op_stats.py /tmp/serve --iters 5
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
    if args.npz_weights:
        from tools.export_bench_weights import load_bench_variables

        variables = jax.device_put(load_bench_variables(args.npz_weights))
    else:
        variables = det.init(jax.random.PRNGKey(0))
    b = args.batch_size
    h, w = det.config.size
    if args.frames:
        from tools.export_bench_images import load_bench_images

        images = jnp.asarray(load_bench_images(args.frames, b))
    else:
        images = jnp.asarray(np.random.RandomState(0).rand(b, h, w, 3),
                             jnp.float32)

    if args.mode == "predict":
        step = make_predict_step(det, impl=args.impl)
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
    p.add_argument("--impl", default="reference",
                   help="postprocess impl for --mode predict "
                        "('reference' | 'fused')")
    p.add_argument("--npz-weights", default="",
                   help="trained-weights npz (tools/export_bench_weights) "
                        "instead of random init")
    p.add_argument("--frames", default="",
                   help="real-frames npz (tools/export_bench_images) "
                        "instead of random input")
    sys.exit(main(p.parse_args()))
