"""Training CLI (reference demonet/train.py:51-210).

Usage (single host drives all local TPU chips via the data mesh — no
torch.distributed.launch equivalent needed; multi-host uses
jax.distributed.initialize automatically):

    python -m demonet_tpu.train --data-path /data/coco --dataset coco \
        --model ssdlite320_mobilenet_v3_large --batch-size 16 --epochs 26

Defaults mirror the reference recipe: lr 0.02, SGD momentum 0.9, weight
decay 1e-4, epochs 26, MultiStepLR [16, 22] gamma 0.1, linear warmup 1000
iters (train.py:59-75, engine.py:21-25).
"""

from __future__ import annotations

import argparse
import os
import time


def get_args_parser(add_help: bool = True) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="demonet_tpu detection training", add_help=add_help)
    parser.add_argument("--data-path", default="/data/coco", help="dataset root")
    parser.add_argument("--dataset", default="coco",
                        choices=["coco", "voc", "synthetic"],
                        help="'synthetic' needs no data on disk "
                             "(demonet_tpu/data/synthetic.py)")
    parser.add_argument("--synthetic-size", default=64, type=int,
                        help="images per split for --dataset synthetic")
    parser.add_argument("--num-workers", "-j", default=0, type=int,
                        help="loader worker processes (0 = prefetch thread"
                             " only; reference train.py -j)")
    parser.add_argument("--model", default="ssdlite320_mobilenet_v3_large")
    parser.add_argument("--num-classes", default=None, type=int,
                        help="default: 91 for coco, 21 for voc")
    parser.add_argument("--batch-size", "-b", default=16, type=int,
                        help="global batch size (sharded over the mesh)")
    parser.add_argument("--epochs", default=26, type=int)
    parser.add_argument("--lr", default=0.02, type=float)
    parser.add_argument("--momentum", default=0.9, type=float)
    parser.add_argument("--weight-decay", "--wd", default=1e-4, type=float,
                        dest="weight_decay")
    parser.add_argument("--lr-steps", default=[16, 22], nargs="+", type=int)
    parser.add_argument("--lr-gamma", default=0.1, type=float)
    parser.add_argument("--warmup-iters", default=1000, type=int)
    parser.add_argument("--print-freq", default=20, type=int)
    parser.add_argument("--output-dir", default=".")
    parser.add_argument("--resume", default="", help="checkpoint path")
    parser.add_argument("--start-epoch", default=0, type=int)
    parser.add_argument("--data-augmentation", default="hflip",
                        choices=["hflip", "ssd"])
    parser.add_argument("--aspect-ratio-group-factor", default=-1, type=int,
                        help="k for 2^linspace(-1,1,2k+1) aspect bins; -1 off"
                             " (reference train.py:130-135)")
    parser.add_argument("--max-gt", default=100, type=int,
                        help="ground-truth padding per image")
    parser.add_argument("--trainable-backbone-layers", default=None, type=int,
                        help="stages to train from the top (0..6); None = all"
                             " (reference train.py flag semantics)")
    parser.add_argument("--lane-pack", dest="lane_pack", action="store_true",
                        help="run the early trunk in the lane-packed layout "
                             "(ops/lane_pack.py) — training-throughput knob, "
                             "identical math (ssdlite320_mobilenet_v3_large)")
    parser.add_argument("--stem-s2d", dest="stem_s2d", action="store_true",
                        help="compute the 3-channel stem conv on the "
                             "space-to-depth layout (exact, 4x lane fill; "
                             "ops/lane_pack.s2d_stem_kernel)")
    parser.add_argument("--postprocess", default="reference",
                        choices=["reference", "fused"],
                        help="eval postprocess: 'fused' = trained-model fast "
                             "path (chunk-gather select + one NMS/image)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize activations (jax.checkpoint)")
    parser.add_argument("--steps-per-call", default=1, type=int,
                        help="optimizer steps per device dispatch: K batches "
                             "are stacked and run as one lax.scan program, "
                             "amortizing per-step host dispatch latency "
                             "(metrics/abort/checkpoint semantics unchanged)")
    parser.add_argument("--u8-transfer", dest="u8_transfer",
                        action="store_true",
                        help="ship images host->device as uint8 (1/4 the "
                             "bytes) and rescale to [0,1] on device; "
                             "quantizes augmented pixels to 8-bit")
    parser.add_argument("--score-thresh", default=None, type=float,
                        help="override the builder's postprocess score "
                             "threshold (a builder kwarg in the reference, "
                             "generalized_ssd.py:158 — the v0 families "
                             "default to demo-grade 0.5, too high for mAP "
                             "evaluation)")
    parser.add_argument("--test-only", dest="test_only", action="store_true")
    parser.add_argument("--pretrained", action="store_true",
                        help="start from the published reference checkpoint "
                             "(resolved from the local weights cache; see "
                             "tools/fetch_weights.py)")
    parser.add_argument("--torch-weights", default="",
                        help="path to a torch .pth checkpoint to convert "
                             "and load (reference state_dict layout)")
    parser.add_argument("--npz-weights", default="",
                        help="flat .npz variables (the committed bench-asset "
                             "layout) to load as model weights — e.g. for "
                             "--test-only evaluation of a bench asset")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (params stay fp32)")
    parser.add_argument("--tensorboard", action="store_true",
                        help="also write tf.summary scalars")
    return parser


def build_datasets(args):
    from demonet_tpu.data.presets import DetectionPresetEval, DetectionPresetTrain

    train_tf = DetectionPresetTrain(args.data_augmentation)
    eval_tf = DetectionPresetEval()
    if args.dataset == "coco":
        from demonet_tpu.data.coco import get_coco

        ds_train = get_coco(args.data_path, "train", train_tf)
        ds_val = get_coco(args.data_path, "val", eval_tf)
        num_classes = 91
    elif args.dataset == "synthetic":
        from demonet_tpu.data.synthetic import SyntheticDetection

        num_classes = 7
        ds_train = SyntheticDetection(
            n=args.synthetic_size, num_classes=num_classes,
            seed=args.seed, transforms=train_tf)
        ds_val = SyntheticDetection(
            n=args.synthetic_size, num_classes=num_classes,
            seed=args.seed + 1, transforms=eval_tf)
    else:
        from demonet_tpu.data.voc import VOCDetection

        ds_train = VOCDetection(args.data_path, "2007", "trainval", train_tf)
        ds_val = VOCDetection(args.data_path, "2007", "test", eval_tf)
        num_classes = 21
    return ds_train, ds_val, num_classes


def make_evaluator(args, ds_val):
    if args.dataset in ("coco", "synthetic"):
        from demonet_tpu.data.coco_eval import CocoEvaluator

        return CocoEvaluator(ds_val.ground_truth_for_eval())
    from demonet_tpu.data.voc_eval import VocEvaluator

    return VocEvaluator(ds_val)


def main(args) -> None:
    import jax
    import jax.numpy as jnp

    from demonet_tpu.data.loader import DetectionLoader
    from demonet_tpu.engine import (
        create_train_state,
        evaluate,
        make_lr_schedule,
        make_optimizer,
        make_predict_step,
        make_train_step,
        train_one_epoch,
    )
    from demonet_tpu.models import get_model
    from demonet_tpu.parallel import data_mesh, initialize, is_main_process, replicate
    from demonet_tpu.utils.checkpoints import load_checkpoint, save_checkpoint

    initialize()
    print(args)
    mesh = data_mesh()

    ds_train, ds_val, default_classes = build_datasets(args)
    num_classes = args.num_classes or default_classes

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model_kw = dict(num_classes=num_classes, dtype=dtype)
    if getattr(args, "lane_pack", False):
        model_kw["lane_pack"] = True  # builders without the knob raise
    if getattr(args, "stem_s2d", False):
        model_kw["stem_s2d"] = True
    if getattr(args, "score_thresh", None) is not None:
        model_kw["score_thresh"] = args.score_thresh
    detector = get_model(args.model, **model_kw)
    size = detector.config.size

    loader_kw = dict(
        image_size=size, max_gt=args.max_gt, seed=args.seed,
        num_workers=args.num_workers,
        num_shards=jax.process_count(), shard_index=jax.process_index(),
        image_dtype="uint8" if getattr(args, "u8_transfer", False)
        else "float32")
    batch_sampler = None
    if args.aspect_ratio_group_factor >= 0:
        from demonet_tpu.data.group_by_aspect_ratio import (
            GroupedBatchSampler, create_aspect_ratio_groups)

        group_ids = create_aspect_ratio_groups(
            ds_train, k=args.aspect_ratio_group_factor)
        batch_sampler = GroupedBatchSampler(
            group_ids, args.batch_size, seed=args.seed)
    train_loader = DetectionLoader(
        ds_train, args.batch_size, shuffle=True, drop_last=True,
        batch_sampler=batch_sampler, **loader_kw)
    val_loader = DetectionLoader(ds_val, args.batch_size, **loader_kw)

    steps_per_epoch = len(train_loader)
    schedule = make_lr_schedule(
        args.lr, steps_per_epoch, args.lr_steps, args.lr_gamma,
        args.warmup_iters)
    tx = make_optimizer(schedule, args.momentum, args.weight_decay)
    if args.trainable_backbone_layers is not None:
        from demonet_tpu.utils.freeze import (
            masked_optimizer, mobilenet_trainable_mask)

        variables0 = detector.init(jax.random.PRNGKey(args.seed))
        mask = mobilenet_trainable_mask(
            variables0["params"], args.trainable_backbone_layers)
        tx = masked_optimizer(tx, mask)
        del variables0
    state = create_train_state(detector, jax.random.PRNGKey(args.seed), tx)
    if args.pretrained or args.torch_weights:
        from demonet_tpu.utils.pretrained import apply_pretrained

        state = apply_pretrained(
            state, args.model, path=args.torch_weights or None)
        print(f"loaded pretrained weights for {args.model}")
    if getattr(args, "npz_weights", ""):
        from demonet_tpu.utils.checkpoints import load_npz_variables

        npz = load_npz_variables(args.npz_weights)
        state = state.replace(params=npz["params"],
                              batch_stats=npz.get("batch_stats") or {})
        print(f"loaded npz weights from {args.npz_weights}")
    state = jax.device_put(state, replicate(mesh))

    start_epoch = args.start_epoch
    if args.resume:
        state, epoch, _ = load_checkpoint(args.resume, state)
        start_epoch = epoch + 1
        print(f"resumed from {args.resume} at epoch {start_epoch}")

    train_step = make_train_step(detector, mesh=mesh, remat=args.remat)
    spc = max(1, getattr(args, "steps_per_call", 1))
    multi_step = make_train_step(
        detector, mesh=mesh, remat=args.remat,
        steps_per_call=spc) if spc > 1 else None
    predict_step = make_predict_step(
        detector, mesh=mesh, impl=getattr(args, "postprocess", "reference"))

    if args.test_only:
        evaluate(predict_step, state, val_loader, make_evaluator(args, ds_val),
                 mesh=mesh)
        return

    from demonet_tpu.utils.metrics_writer import MetricsWriter

    writer = MetricsWriter(args.output_dir or ".",
                           tensorboard=args.tensorboard)
    print("Start training")
    start = time.time()
    for epoch in range(start_epoch, args.epochs):
        train_loader.set_epoch(epoch)
        state = train_one_epoch(
            train_step, state, train_loader, epoch,
            print_freq=args.print_freq, lr_schedule=schedule, mesh=mesh,
            metrics_writer=writer, multi_step=multi_step,
            steps_per_call=spc)
        if args.output_dir:
            save_checkpoint(args.output_dir, jax.device_get(state), epoch,
                            metadata={"args": vars(args)})
        evaluate(predict_step, state, val_loader, make_evaluator(args, ds_val),
                 mesh=mesh)

    total = time.time() - start
    if is_main_process():
        print(f"Training time {total / 3600:.2f}h")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
