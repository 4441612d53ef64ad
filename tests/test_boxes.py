"""Golden tests for box geometry vs hand-computed values and the reference's
formulas (demonet/util/box_ops.py, demonet/models/_utils.py) re-derived in
numpy."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from demonet_tpu.ops import boxes as B


def test_cxcywh_xyxy_roundtrip():
    b = jnp.array([[10.0, 20.0, 30.0, 40.0], [0.0, 0.0, 4.0, 2.0]])
    xyxy = B.box_cxcywh_to_xyxy(b)
    np.testing.assert_allclose(
        np.asarray(xyxy), [[-5, 0, 25, 40], [-2, -1, 2, 1]], atol=1e-6)
    back = B.box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), np.asarray(b), atol=1e-6)


def test_box_iou_hand_computed():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0],
                   [5.0, 5.0, 15.0, 15.0],
                   [20.0, 20.0, 30.0, 30.0]])
    iou, union = B.box_iou(a, b)
    np.testing.assert_allclose(
        np.asarray(iou[0]), [1.0, 25.0 / 175.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(union[0]), [100.0, 175.0, 200.0])


def test_giou_disjoint_negative():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[2.0, 2.0, 3.0, 3.0]])
    giou = B.generalized_box_iou(a, b)
    # iou=0, union=2, enclosing=9 -> giou = -(9-2)/9
    np.testing.assert_allclose(np.asarray(giou[0, 0]), -7.0 / 9.0, atol=1e-6)


def test_encode_decode_roundtrip():
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 25.0, 15.0]])
    gt = jnp.array([[1.0, 2.0, 11.0, 13.0], [4.0, 3.0, 28.0, 18.0]])
    deltas = B.encode_boxes(gt, anchors)
    back = B.decode_boxes(deltas, anchors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=2e-3)


def test_encode_matches_reference_formula():
    # Hand-computed with the reference's formula (_utils.py:81-126),
    # weights (10, 10, 5, 5).
    anchor = jnp.array([[0.0, 0.0, 10.0, 20.0]])  # cx 5, cy 10, w 10, h 20
    gt = jnp.array([[2.0, 4.0, 10.0, 24.0]])  # cx 6, cy 14, w 8, h 20
    d = np.asarray(B.encode_boxes(gt, anchor))[0]
    assert d[0] == pytest.approx(10.0 * (6 - 5) / 10.0, abs=1e-4)
    assert d[1] == pytest.approx(10.0 * (14 - 10) / 20.0, abs=1e-4)
    assert d[2] == pytest.approx(5.0 * math.log(8 / 10), abs=1e-3)
    assert d[3] == pytest.approx(5.0 * math.log(20 / 20), abs=1e-3)


def test_decode_exp_clamp():
    # Huge dw must be clamped at log(1000/16) (_utils.py:135).
    anchor = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.array([[0.0, 0.0, 1e6, 1e6]])
    out = np.asarray(B.decode_boxes(deltas, anchor))[0]
    w = out[2] - out[0]
    assert w == pytest.approx(10.0 * 1000.0 / 16.0, rel=1e-3)


def test_clip_boxes():
    b = jnp.array([[-5.0, -5.0, 400.0, 200.0]])
    out = B.clip_boxes_to_image(b, (100, 300))  # (h, w)
    np.testing.assert_allclose(np.asarray(out), [[0, 0, 300, 100]])


def test_remove_small_boxes_mask():
    b = jnp.array([[0, 0, 5, 5], [0, 0, 0.5, 5], [0, 0, 5, 0.5]], jnp.float32)
    m = np.asarray(B.remove_small_boxes_mask(b, 1.0))
    assert m.tolist() == [True, False, False]


def test_masks_to_boxes():
    m = np.zeros((2, 8, 8), bool)
    m[0, 2:5, 3:7] = True  # rows 2-4, cols 3-6
    out = np.asarray(B.masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(out[0], [3, 2, 6, 4])
    np.testing.assert_allclose(out[1], [0, 0, 0, 0])
