"""VOC evaluation CLI (restores the reference's demonet/eval_voc.py in
working form — its imports were broken, SURVEY.md §0).

    python -m demonet_tpu.eval_voc --data-path /data/VOCdevkit \
        --arch ssd_lite_mobilenet_v2 --checkpoint ckpt_dir/checkpoint_25

Runs batched inference over VOC2007 test, writes VOCdevkit-style detection
files (optional), prints per-class AP + mean AP with the VOC07 11-point
metric (reference eval_voc.py:50-96).
"""

from __future__ import annotations

import argparse


def get_args_parser(add_help: bool = True) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="demonet_tpu VOC evaluation", add_help=add_help)
    parser.add_argument("--data-path", default="/data/VOCdevkit")
    parser.add_argument("--year", default="2007")
    parser.add_argument("--image-set", default="test")
    parser.add_argument("--arch", default="ssd_lite_mobilenet_v2")
    parser.add_argument("--num-classes", default=21, type=int)
    parser.add_argument("--image-size", default=320, type=int)
    parser.add_argument("--batch-size", "-b", default=32, type=int)
    parser.add_argument("--score-thresh", default=0.01, type=float)
    parser.add_argument("--checkpoint", default="",
                        help="orbax checkpoint to evaluate")
    parser.add_argument("--torch-weights", default="",
                        help=".pth checkpoint (converted on the fly)")
    parser.add_argument("--pretrained", action="store_true",
                        help="published checkpoint from the weights cache")
    parser.add_argument("--results-dir", default="",
                        help="write det_test_<cls>.txt files here")
    parser.add_argument("--use-07-metric", action="store_true", default=True)
    parser.add_argument("--postprocess", default="reference",
                        choices=["reference", "fused"],
                        help="'fused' = trained-model fast postprocess "
                             "(~2x serving on sparse scores, exact "
                             "fallback)")
    return parser


def main(args) -> None:
    import jax

    from demonet_tpu.data.loader import DetectionLoader
    from demonet_tpu.data.presets import DetectionPresetEval
    from demonet_tpu.data.voc import VOCDetection
    from demonet_tpu.data.voc_eval import VocEvaluator
    from demonet_tpu.engine import evaluate, make_predict_step
    from demonet_tpu.models import get_model
    from demonet_tpu.parallel import data_mesh, initialize

    initialize()
    mesh = data_mesh()

    dataset = VOCDetection(
        args.data_path, args.year, args.image_set, DetectionPresetEval())
    size = (args.image_size, args.image_size)
    detector = get_model(
        args.arch, num_classes=args.num_classes, size=size,
        score_thresh=args.score_thresh)

    variables = detector.init(jax.random.PRNGKey(0))
    if args.pretrained or args.torch_weights:
        from demonet_tpu.utils.pretrained import load_pretrained_variables

        variables = load_pretrained_variables(
            args.arch, path=args.torch_weights or None)
        print(f"loaded pretrained weights for {args.arch}")
    elif args.checkpoint:
        from demonet_tpu.utils.checkpoints import load_variables

        variables = load_variables(args.checkpoint)

    loader = DetectionLoader(
        dataset, args.batch_size, image_size=size,
        num_shards=jax.process_count(), shard_index=jax.process_index())
    evaluator = VocEvaluator(
        dataset, use_07_metric=args.use_07_metric,
        output_dir=args.results_dir or None)
    predict_step = make_predict_step(detector, mesh=mesh,
                                     impl=args.postprocess)
    evaluate(predict_step, variables, loader, evaluator, mesh=mesh)


if __name__ == "__main__":
    main(get_args_parser().parse_args())
