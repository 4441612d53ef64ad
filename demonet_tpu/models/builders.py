"""Model builders + registry.

Capability parity with the reference's public model surface
(demonet/models/__init__.py:1-6 and hubconf.py):
  * ssdlite320_mobilenet_v3_large  (ssd_mobilenetv3.py:159-227)
  * ssd300_vgg16                   (ssd_vgg16.py:139-213)
  * ssd512_vgg16                   (the highres variant wired through
                                    SSDFeatureExtractorVGG, ssd_vgg16.py:74-81)
  * ssd_lite_mobilenet_v2          (the v0/hubconf model, hubconf.py:25-44;
                                    backbone.py:45-67; restored in working form)
  * mobilenet_v2 / mobilenet_v3_large / mobilenet_v3_small classifiers

Each detection builder returns a `Detector` (module + SSDConfig + anchors).
`get_model(name, **kwargs)` resolves names the way train.py does with
`models.__dict__[args.model]` (reference train.py:154).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from demonet_tpu.models import anchors as anchor_lib
from demonet_tpu.models.detection import Detector, SSD, SSDConfig
from demonet_tpu.models.features import (
    MobileNetV2ExtraBlocks,
    SSDLiteMobileNetExtractor,
)
from demonet_tpu.models.heads import SSDHead, SSDLiteHead
from demonet_tpu.models.mobilenetv2 import mobilenet_v2  # noqa: F401 (registry)
from demonet_tpu.models.mobilenetv3 import (  # noqa: F401 (registry)
    mobilenet_v3_large,
    mobilenet_v3_small,
)
from demonet_tpu.models.vgg import VGG16SSDExtractor


def feature_grid_sizes(
    extractor: nn.Module, size: Tuple[int, int]
) -> List[Tuple[int, int]]:
    """Static (H, W) of each feature map, via shape-only tracing (no FLOPs).

    Replaces the reference's dummy forward `retrieve_out_channels`
    (_utils.py:383-409) — with static shapes `jax.eval_shape` answers this
    at trace time.
    """
    x = jax.ShapeDtypeStruct((1, size[0], size[1], 3), jnp.float32)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    variables = jax.eval_shape(
        functools.partial(extractor.init, train=False), rng, x)
    outs = jax.eval_shape(
        functools.partial(extractor.apply, train=False), variables, x)
    return [(int(o.shape[1]), int(o.shape[2])) for o in outs]


def ssdlite320_mobilenet_v3_large(
    num_classes: int = 91,
    size: Tuple[int, int] = (320, 320),
    reduced_tail: bool = True,
    dtype: Any = jnp.float32,
    lane_pack: bool = False,
    lane_pack_max_lanes: int = 128,
    stem_s2d: bool = False,
    **config_overrides: Any,
) -> Detector:
    """SSDLite320 + MobileNetV3-Large — the flagship model
    (reference ssd_mobilenetv3.py:159-227, defaults :202-216).

    lane_pack: run the early trunk blocks in the lane-packed layout
    (ops/lane_pack.py) — a training-throughput knob with an identical
    variable tree; numerics match up to conv summation order.
    stem_s2d: compute the 3-channel stem conv on the space-to-depth
    layout (exact; same variable tree; lane-fill knob)."""
    extractor = SSDLiteMobileNetExtractor(
        arch="mobilenet_v3_large", reduced_tail=reduced_tail, dtype=dtype,
        lane_pack=lane_pack, lane_pack_max_lanes=lane_pack_max_lanes,
        stem_s2d=stem_s2d)
    aspect_ratios = [[2, 3]] * 6
    num_anchors = anchor_lib.num_anchors_per_location(aspect_ratios)
    head = SSDLiteHead(tuple(num_anchors), num_classes, dtype=dtype)
    defaults = dict(
        image_mean=(0.5, 0.5, 0.5), image_std=(0.5, 0.5, 0.5),
        score_thresh=0.001, nms_thresh=0.55,
        detections_per_img=300, topk_candidates=300)
    config = SSDConfig(size=size, num_classes=num_classes,
                       **{**defaults, **config_overrides})
    grids = feature_grid_sizes(extractor, size)
    boxes = anchor_lib.default_boxes(
        grids, size, aspect_ratios, min_ratio=0.2, max_ratio=0.95)
    return Detector(SSD(extractor, head), config, boxes)


def _ssd_vgg16(
    num_classes: int,
    size: Tuple[int, int],
    highres: bool,
    dtype: Any,
    lane_pack: bool = False,
    **config_overrides: Any,
) -> Detector:
    extractor = VGG16SSDExtractor(highres=highres, dtype=dtype,
                                  lane_pack=lane_pack)
    if highres:
        # SSD512 config per the SSD paper (7 maps).
        aspect_ratios = [[2], [2, 3], [2, 3], [2, 3], [2, 3], [2], [2]]
        scales = [0.04, 0.1, 0.26, 0.42, 0.58, 0.74, 0.9, 1.06]
        steps = [8, 16, 32, 64, 128, 256, 512]
    else:
        # reference ssd_vgg16.py:196-198
        aspect_ratios = [[2], [2, 3], [2, 3], [2, 3], [2], [2]]
        scales = [0.07, 0.15, 0.33, 0.51, 0.69, 0.87, 1.05]
        steps = [8, 16, 32, 64, 100, 300]
    num_anchors = anchor_lib.num_anchors_per_location(aspect_ratios)
    head = SSDHead(tuple(num_anchors), num_classes, dtype=dtype)
    defaults = dict(
        # caffe-style normalization (reference ssd_vgg16.py:200-203)
        image_mean=(0.48235, 0.45882, 0.40784),
        image_std=(1.0 / 255.0, 1.0 / 255.0, 1.0 / 255.0))
    config = SSDConfig(size=size, num_classes=num_classes,
                       **{**defaults, **config_overrides})
    grids = feature_grid_sizes(extractor, size)
    boxes = anchor_lib.default_boxes(
        grids, size, aspect_ratios, scales=scales, steps=steps)
    return Detector(SSD(extractor, head), config, boxes)


def ssd300_vgg16(num_classes: int = 91, dtype: Any = jnp.float32,
                 lane_pack: bool = False,
                 **config_overrides: Any) -> Detector:
    """Classic SSD300-VGG16 (reference ssd_vgg16.py:139-213).

    lane_pack: run the C=64 block in the lane-packed layout
    (ops/lane_pack.py) — a training-throughput knob with an identical
    variable tree (DESIGN.md "Lane-packed VGG block 1")."""
    return _ssd_vgg16(num_classes, (300, 300), False, dtype,
                      lane_pack=lane_pack, **config_overrides)


def ssd512_vgg16(num_classes: int = 91, dtype: Any = jnp.float32,
                 lane_pack: bool = False,
                 **config_overrides: Any) -> Detector:
    """SSD512-VGG16 via the highres extras (reference ssd_vgg16.py:74-81)."""
    return _ssd_vgg16(num_classes, (512, 512), True, dtype,
                      lane_pack=lane_pack, **config_overrides)


def ssd_lite_mobilenet_v2(
    num_classes: int = 21,
    size: Tuple[int, int] = (320, 320),
    score_thresh: float = 0.5,
    dtype: Any = jnp.float32,
    stem_s2d: bool = False,
    **config_overrides: Any,
) -> Detector:
    """The legacy v0 SSDLite + MobileNetV2 VOC model, restored in working form
    (reference hubconf.py:25-44 — 320x320, 21 classes, score_thresh 0.5;
    backbone per backbone.py:45-67; head per box_head.py:37-104).

    The v0 prior-box hyperparameters shipped in the (missing)
    `ssd_mobilenet` module; the standard SSDLite prior config
    (6x[2,3] ratios, scales 0.2-0.95) is used, matching the anchor counts
    the legacy head expects (6 per location on 6 maps).
    """
    extractor = MobileNetV2ExtraBlocks(dtype=dtype, stem_s2d=stem_s2d)
    aspect_ratios = [[2, 3]] * 6
    num_anchors = anchor_lib.num_anchors_per_location(aspect_ratios)
    # legacy MultiBoxLiteHead: separable blocks with default-BN (eps 1e-5)
    # and a plain 1x1 conv on the last level (reference box_head.py:24-56)
    head = SSDLiteHead(tuple(num_anchors), num_classes, bn_eps=1e-5,
                       bn_momentum=0.9, last_plain=True, dtype=dtype)
    defaults = dict(
        image_mean=(0.5, 0.5, 0.5), image_std=(0.5, 0.5, 0.5),
        score_thresh=score_thresh, nms_thresh=0.45,
        detections_per_img=100, topk_candidates=400)
    config = SSDConfig(size=size, num_classes=num_classes,
                       **{**defaults, **config_overrides})
    grids = feature_grid_sizes(extractor, size)
    boxes = anchor_lib.default_boxes(
        grids, size, aspect_ratios, min_ratio=0.2, max_ratio=0.95)
    return Detector(SSD(extractor, head), config, boxes)


def pelee304(
    num_classes: int = 21,
    size: Tuple[int, int] = (304, 304),
    score_thresh: float = 0.5,
    dtype: Any = jnp.float32,
    **config_overrides: Any,
) -> Detector:
    """Pelee-SSD 304 (the v0 Pelee detector, restored in working form —
    reference pelee.py:184-212: PeleeNet backbone, 5 maps, 6 anchors each,
    ratios 5x[2,3], scales 0.15-0.9, steps [16, 30, 60, 101, 304])."""
    from demonet_tpu.models.heads import Pelee1x1Head
    from demonet_tpu.models.peleenet import PeleeExtractor

    extractor = PeleeExtractor(dtype=dtype)
    aspect_ratios = [[2, 3]] * 5
    num_anchors = anchor_lib.num_anchors_per_location(aspect_ratios)
    head = Pelee1x1Head(tuple(num_anchors), num_classes, dtype=dtype)
    defaults = dict(
        image_mean=(0.5, 0.5, 0.5), image_std=(0.5, 0.5, 0.5),
        score_thresh=score_thresh, nms_thresh=0.45,
        detections_per_img=100, topk_candidates=400)
    config = SSDConfig(size=size, num_classes=num_classes,
                       **{**defaults, **config_overrides})
    grids = feature_grid_sizes(extractor, size)
    # the paper's steps are defined for the 304 input; at other (test) sizes
    # fall back to grid-derived centers
    steps = [16, 30, 60, 101, 304] if size == (304, 304) else None
    boxes = anchor_lib.default_boxes(
        grids, size, aspect_ratios, min_ratio=0.15, max_ratio=0.9, steps=steps)
    return Detector(SSD(extractor, head), config, boxes)


# --- registry (reference demonet/models/__init__.py + train.py:154) ---
MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {
    "ssdlite320_mobilenet_v3_large": ssdlite320_mobilenet_v3_large,
    "ssd300_vgg16": ssd300_vgg16,
    "ssd512_vgg16": ssd512_vgg16,
    "ssd_lite_mobilenet_v2": ssd_lite_mobilenet_v2,
    "pelee304": pelee304,
    "mobilenet_v2": mobilenet_v2,
    "mobilenet_v3_large": mobilenet_v3_large,
    "mobilenet_v3_small": mobilenet_v3_small,
    "peleenet_v1": None,  # set below (lazy import keeps builders.py light)
}

from demonet_tpu.models.peleenet import peleenet_v1  # noqa: E402

MODEL_REGISTRY["peleenet_v1"] = peleenet_v1


def get_model(name: str, **kwargs: Any):
    """Resolve a model by its public name (torch.hub-style registry)."""
    try:
        builder = MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None
    return builder(**kwargs)
