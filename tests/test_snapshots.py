"""Snapshot (regression-pin) tests: checksums of derived constants that must
never drift silently — anchor arrays, config defaults, head output shapes.

If an intentional change lands (e.g. new anchor recipe), update the pinned
values here in the same commit and say why.
"""

import hashlib

import numpy as np

from demonet_tpu.models import anchors as A


def _digest(arr: np.ndarray) -> str:
    return hashlib.sha256(
        np.ascontiguousarray(arr, np.float32).tobytes()).hexdigest()[:16]


def test_ssdlite320_anchor_snapshot():
    grids = [(20, 20), (10, 10), (5, 5), (3, 3), (2, 2), (1, 1)]
    boxes = A.default_boxes(grids, (320, 320), [[2, 3]] * 6,
                            min_ratio=0.2, max_ratio=0.95)
    assert boxes.shape == (3234, 4)
    # spot values: first anchor centered at cell (0,0) center = (8, 8),
    # wh = (0.2, 0.2) * 320 = 64 -> [-24, -24, 40, 40]
    np.testing.assert_allclose(boxes[0], [-24, -24, 40, 40], atol=1e-3)
    assert _digest(boxes) == "66ef39989b5dda5e"


def test_ssd300_anchor_snapshot():
    grids = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    boxes = A.default_boxes(
        grids, (300, 300), [[2], [2, 3], [2, 3], [2, 3], [2], [2]],
        scales=[0.07, 0.15, 0.33, 0.51, 0.69, 0.87, 1.05],
        steps=[8, 16, 32, 64, 100, 300])
    assert boxes.shape == (8732, 4)
    assert _digest(boxes) == "aee73ce50ce5a499"


def test_config_defaults_snapshot():
    """The reference's hyperparameter defaults, pinned
    (generalized_ssd.py:158-163, ssd_mobilenetv3.py:207-216)."""
    from demonet_tpu.models.detection import SSDConfig

    c = SSDConfig(size=(300, 300), num_classes=91)
    assert (c.score_thresh, c.nms_thresh) == (0.01, 0.45)
    assert (c.detections_per_img, c.topk_candidates) == (200, 400)
    assert (c.iou_thresh, c.positive_fraction) == (0.5, 0.25)
    assert c.neg_to_pos_ratio == 3.0
    assert c.box_coder_weights == (10.0, 10.0, 5.0, 5.0)

    from demonet_tpu.models import ssdlite320_mobilenet_v3_large

    d = ssdlite320_mobilenet_v3_large(num_classes=4, size=(64, 64))
    assert d.config.score_thresh == 0.001
    assert d.config.nms_thresh == 0.55
    assert d.config.detections_per_img == 300
    assert d.config.topk_candidates == 300
    assert d.config.image_mean == (0.5, 0.5, 0.5)


def test_bbox_xform_clip_constant():
    import math

    from demonet_tpu.ops.boxes import BBOX_XFORM_CLIP

    assert BBOX_XFORM_CLIP == math.log(1000.0 / 16.0)
