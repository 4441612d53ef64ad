"""DefaultBox generator parity vs the reference's documented semantics
(demonet/models/anchor_utils.py)."""

import math

import numpy as np
import pytest

from demonet_tpu.models import anchors as A


def test_scales_interpolation():
    # reference anchor_utils.py:39-47 with min 0.2, max 0.95, 6 maps
    s = A.compute_scales(6, 0.2, 0.95)
    assert len(s) == 7
    assert s[0] == pytest.approx(0.2)
    assert s[-2] == pytest.approx(0.95)
    assert s[-1] == 1.0
    assert s[1] == pytest.approx(0.2 + 0.75 * 1 / 5)


def test_num_anchors_per_location():
    assert A.num_anchors_per_location([[2], [2, 3]]) == [4, 6]


def test_wh_pairs_level0():
    scales = [0.2, 0.35, 1.0]
    whs = A.wh_pairs_per_level([[2]], scales)
    w = whs[0]
    assert w.shape == (4, 2)
    np.testing.assert_allclose(w[0], [0.2, 0.2])
    sp = math.sqrt(0.2 * 0.35)
    np.testing.assert_allclose(w[1], [sp, sp], rtol=1e-6)
    np.testing.assert_allclose(w[2], [0.2 * math.sqrt(2), 0.2 / math.sqrt(2)],
                               rtol=1e-6)
    np.testing.assert_allclose(w[3], [0.2 / math.sqrt(2), 0.2 * math.sqrt(2)],
                               rtol=1e-6)


def test_default_boxes_single_cell():
    # One 1x1 feature map, scale via explicit scales, image 100x100.
    boxes = A.default_boxes(
        [(1, 1)], (100, 100), [[2]], scales=[0.5, 0.5])
    assert boxes.shape == (4, 4)
    # first box: center (0.5, 0.5), wh (0.5, 0.5) -> [25, 25, 75, 75]
    np.testing.assert_allclose(boxes[0], [25, 25, 75, 75], atol=1e-4)


def test_default_boxes_grid_centers_and_order():
    # 2x2 grid, 1 ratio => A=4 anchors/cell, order: location-major.
    boxes = A.default_boxes([(2, 2)], (100, 100), [[2]], scales=[0.2, 0.2])
    assert boxes.shape == (16, 4)
    centers = (boxes[:, :2] + boxes[:, 2:]) / 2
    # first 4 rows share center (25, 25); next 4 share (75, 25) [x-major]
    np.testing.assert_allclose(centers[:4], np.tile([25, 25], (4, 1)), atol=1e-4)
    np.testing.assert_allclose(centers[4:8], np.tile([75, 25], (4, 1)), atol=1e-4)
    np.testing.assert_allclose(centers[8:12], np.tile([25, 75], (4, 1)), atol=1e-4)


def test_default_boxes_with_steps():
    # With steps, the center denominator is image/step (anchor_utils.py:80-83):
    # image 300, step 8 => denom 37.5; cell 0 center x = 0.5/37.5*300 = 4.
    boxes = A.default_boxes([(38, 38)], (300, 300), [[2]],
                            scales=[0.07, 0.15], steps=[8])
    cx0 = (boxes[0, 0] + boxes[0, 2]) / 2
    assert cx0 == pytest.approx(4.0, abs=1e-3)


def test_ssdlite320_anchor_count():
    # 6 maps at 320: 20,10,5,3,2,1 with 6 anchors/location = 3234 anchors.
    grids = [(20, 20), (10, 10), (5, 5), (3, 3), (2, 2), (1, 1)]
    boxes = A.default_boxes(grids, (320, 320), [[2, 3]] * 6,
                            min_ratio=0.2, max_ratio=0.95)
    assert boxes.shape == (6 * (400 + 100 + 25 + 9 + 4 + 1), 4)


def test_ssd300_anchor_count():
    # Paper: 38^2*4 + 19^2*6 + 10^2*6 + 5^2*6 + 3^2*4 + 1*4 = 8732.
    grids = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    boxes = A.default_boxes(
        grids, (300, 300), [[2], [2, 3], [2, 3], [2, 3], [2], [2]],
        scales=[0.07, 0.15, 0.33, 0.51, 0.69, 0.87, 1.05],
        steps=[8, 16, 32, 64, 100, 300])
    assert boxes.shape == (8732, 4)
