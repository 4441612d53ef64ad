"""Single-image / folder inference demo CLI.

    python -m demonet_tpu.predict --model ssdlite320_mobilenet_v3_large \
        --checkpoint ckpts/checkpoint_25 --images dog.jpg street.jpg \
        --score-thresh 0.5 --output-dir vis/

The demo-path capability of the reference (util/image_utils.py + hub usage
in README): load, run the jitted pipeline (preproc->NMS on device), draw
boxes + class names, save.
"""

from __future__ import annotations

import argparse
import os


def get_args_parser(add_help: bool = True) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="demonet_tpu predict",
                                add_help=add_help)
    p.add_argument("--model", default="ssdlite320_mobilenet_v3_large")
    p.add_argument("--num-classes", default=91, type=int)
    p.add_argument("--dataset-labels", default="coco", choices=["coco", "voc"])
    p.add_argument("--checkpoint", default="")
    p.add_argument("--torch-weights", default="")
    p.add_argument("--pretrained", action="store_true",
                   help="published checkpoint from the weights cache "
                        "(utils/pretrained.py)")
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--postprocess", default="reference",
                   choices=["reference", "fused"],
                   help="'fused' = trained-model fast postprocess "
                        "(chunk-gather select + one NMS/image, exactness-"
                        "guarded fallback)")
    p.add_argument("--score-thresh", default=0.5, type=float)
    p.add_argument("--output-dir", default="predictions")
    return p


def main(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from demonet_tpu.engine import make_predict_step
    from demonet_tpu.models import get_model
    from demonet_tpu.utils.viz import (
        load_image, overlay_boxes, overlay_class_names,
        select_top_predictions)

    if args.dataset_labels == "coco":
        from demonet_tpu.data.coco import COCO_CLASSES as class_names
    else:
        from demonet_tpu.data.voc import VOC_CLASSES as class_names

    detector = get_model(args.model, num_classes=args.num_classes)
    variables = detector.init(jax.random.PRNGKey(0))
    if args.pretrained or args.torch_weights:
        from demonet_tpu.utils.pretrained import load_pretrained_variables

        variables = load_pretrained_variables(
            args.model, path=args.torch_weights or None)
    elif args.checkpoint:
        from demonet_tpu.utils.checkpoints import load_variables

        variables = load_variables(args.checkpoint)

    predict = make_predict_step(detector, impl=args.postprocess)
    size = detector.config.size
    os.makedirs(args.output_dir, exist_ok=True)

    for path in args.images:
        import cv2

        orig = (load_image(path) * 255).astype(np.uint8)
        resized = load_image(path, size=size)
        dets = predict(
            variables, jnp.asarray(resized[None]),
            jnp.asarray([[orig.shape[0], orig.shape[1]]]))
        per_img = {k: np.asarray(v)[0] for k, v in dets.items()}
        top = select_top_predictions(per_img, args.score_thresh)
        vis = overlay_boxes(orig, top["boxes"], top["labels"])
        vis = overlay_class_names(
            vis, top["boxes"], top["labels"], top["scores"], class_names)
        out_path = os.path.join(
            args.output_dir, os.path.basename(path))
        cv2.imwrite(out_path, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        print(f"{path}: {len(top['boxes'])} detections above "
              f"{args.score_thresh} -> {out_path}")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
