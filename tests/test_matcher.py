"""SSDMatcher semantics vs hand-worked assignments
(reference demonet/models/_utils.py:227-362)."""

import numpy as np
import jax.numpy as jnp

from demonet_tpu.models.matcher import match, ssd_match
from demonet_tpu.ops.boxes import box_iou


def test_ssd_match_basic_threshold():
    # 2 gt x 3 anchors quality matrix
    q = jnp.array([
        [0.9, 0.3, 0.0],
        [0.1, 0.6, 0.2],
    ])
    m = np.asarray(ssd_match(q, iou_thresh=0.5))
    # anchor0 -> gt0 (0.9), anchor1 -> gt1 (0.6), anchor2 below thresh BUT
    # force-best: gt0's best anchor is 0, gt1's best is 1 => anchor2 = -1
    assert m.tolist() == [0, 1, -1]


def test_ssd_match_force_best_overrides_threshold():
    # gt1's best anchor (2) has IoU 0.3 < thresh, but is force-assigned.
    q = jnp.array([
        [0.9, 0.8, 0.0],
        [0.0, 0.1, 0.3],
    ])
    m = np.asarray(ssd_match(q, iou_thresh=0.5))
    assert m.tolist() == [0, 0, 1]


def test_ssd_match_padded_gt_ignored():
    q = jnp.array([
        [0.9, 0.3, 0.0],
        [0.99, 0.99, 0.99],  # padding row with huge IoU
    ])
    valid = jnp.array([True, False])
    m = np.asarray(ssd_match(q, iou_thresh=0.5, gt_valid=valid))
    assert m.tolist() == [0, -1, -1]


def test_ssd_match_empty_gt():
    q = jnp.zeros((3, 5))
    valid = jnp.zeros((3,), bool)
    m = np.asarray(ssd_match(q, 0.5, valid))
    assert m.tolist() == [-1] * 5


def test_ssd_match_real_boxes():
    anchors = jnp.array([
        [0.0, 0.0, 10.0, 10.0],
        [0.0, 0.0, 20.0, 20.0],
        [50.0, 50.0, 60.0, 60.0],
    ])
    gt = jnp.array([[1.0, 1.0, 11.0, 11.0]])
    iou, _ = box_iou(gt, anchors)
    m = np.asarray(ssd_match(iou, 0.5))
    assert m[0] == 0      # high overlap
    assert m[2] == -1     # disjoint


def test_generic_matcher_between_thresholds():
    q = jnp.array([[0.9, 0.45, 0.2]])
    m = np.asarray(match(q, high_threshold=0.7, low_threshold=0.3))
    assert m.tolist() == [0, -2, -1]


def test_generic_matcher_low_quality_restore():
    q = jnp.array([[0.2, 0.1]])
    m = np.asarray(match(q, 0.7, 0.3, allow_low_quality_matches=True))
    # gt0's best anchor (0) restored despite being below low threshold
    assert m.tolist() == [0, -1]
