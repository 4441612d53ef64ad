"""Keypoint (OKS) COCO evaluation protocol — hand-derived golden values
against the pycocotools computeOks formula (reference CocoEvaluator
iou_types 'keypoints', demonet/data/coco_eval.py:24-29 + engine.py:59-68)."""

import numpy as np
import pytest

from demonet_tpu.data.coco_eval import (
    KPT_OKS_SIGMAS, CocoEvaluator, _oks)


def _person(xy, vis=2.0, k=17):
    """(K, 3) keypoints all at xy with given visibility."""
    kp = np.zeros((k, 3))
    kp[:, 0], kp[:, 1], kp[:, 2] = xy[0], xy[1], vis
    return kp


def test_oks_exact_match_is_one():
    g = _person((50.0, 60.0))[None]
    d = _person((50.0, 60.0))[None]
    boxes = np.asarray([[40.0, 50.0, 60.0, 70.0]])
    oks = _oks(d, g, boxes, np.asarray([400.0]), KPT_OKS_SIGMAS)
    np.testing.assert_allclose(oks, [[1.0]])


def test_oks_hand_computed_displacement():
    """One visible keypoint (index 0, sigma .26/... wait: sigmas[0]=.026),
    dt displaced by (3, 4): e = 25 / (2*.026)^2... hand formula:
    e = d2 / var / (area + eps) / 2 with var = (2*sigma)^2."""
    g = np.zeros((1, 17, 3))
    g[0, 0] = [10.0, 10.0, 2.0]       # only keypoint 0 visible
    d = np.zeros((1, 17, 3))
    d[0, 0] = [13.0, 14.0, 2.0]       # displaced by (3,4): d2 = 25
    boxes = np.asarray([[0.0, 0.0, 20.0, 20.0]])
    area = 100.0
    var0 = (2 * KPT_OKS_SIGMAS[0]) ** 2
    want = np.exp(-25.0 / var0 / (area + np.spacing(1)) / 2.0)
    oks = _oks(d, g, boxes, np.asarray([area]), KPT_OKS_SIGMAS)
    np.testing.assert_allclose(oks, [[want]], rtol=1e-12)


def test_oks_invisible_gt_uses_expanded_box():
    """gt with no visible keypoints: distance to the 2x-expanded box; a dt
    inside it scores exp(0) = 1 per keypoint."""
    g = _person((50.0, 50.0), vis=0.0)[None]
    boxes = np.asarray([[40.0, 40.0, 60.0, 60.0]])  # w=h=20, expanded 20..80
    d_in = _person((30.0, 30.0))[None]              # inside expanded box
    d_out = _person((200.0, 200.0))[None]           # far outside
    oks_in = _oks(d_in, g, boxes, np.asarray([400.0]), KPT_OKS_SIGMAS)
    oks_out = _oks(d_out, g, boxes, np.asarray([400.0]), KPT_OKS_SIGMAS)
    np.testing.assert_allclose(oks_in, [[1.0]])
    assert oks_out[0, 0] < 0.01


def _gt(img_id, centers, areas=None, vis=2.0):
    n = len(centers)
    boxes = np.asarray([[c[0] - 30, c[1] - 30, c[0] + 30, c[1] + 30]
                        for c in centers], np.float64)
    return {
        "image_id": img_id,
        "boxes": boxes,
        "labels": np.ones(n, np.int64),
        "areas": np.asarray(areas if areas is not None else [3600.0] * n),
        "keypoints": np.stack([_person(c, vis) for c in centers]),
    }


def test_keypoint_eval_perfect_predictions():
    gts = [_gt(1, [(50.0, 50.0), (150.0, 150.0)]),
           _gt(2, [(80.0, 90.0)])]
    ev = CocoEvaluator(gts, iou_type="keypoints")
    for g in gts:
        ev.update([{
            "image_id": g["image_id"], "boxes": g["boxes"],
            "scores": np.linspace(0.9, 0.8, len(g["labels"])),
            "labels": g["labels"], "keypoints": g["keypoints"]}])
    ev.accumulate()
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)
    assert stats["AP75"] == pytest.approx(1.0)


def test_keypoint_eval_displacement_crosses_thresholds():
    """A displacement tuned so OKS lands between 0.5 and 0.75: AP50 = 1,
    AP75 = 0."""
    center = (100.0, 100.0)
    gts = [_gt(1, [center], areas=[900.0])]
    # all 17 kpts visible at center; displace all by the same dx so
    # oks = mean_i exp(-dx^2/var_i/area/2). Pick dx for oks ~ 0.6.
    for dx in np.linspace(1.0, 40.0, 200):
        var = (2 * KPT_OKS_SIGMAS) ** 2
        oks = np.mean(np.exp(-(dx ** 2) / var / 900.0 / 2.0))
        if oks < 0.65:
            break
    assert 0.5 < oks < 0.75, oks
    det_kps = np.stack([_person((center[0] + dx, center[1]))])
    ev = CocoEvaluator(gts, iou_type="keypoints")
    ev.update([{
        "image_id": 1, "boxes": gts[0]["boxes"],
        "scores": np.asarray([0.9]), "labels": np.asarray([1]),
        "keypoints": det_kps}])
    ev.accumulate()
    stats = ev.summarize()
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AP75"] == pytest.approx(0.0)


def test_keypoint_gt_without_visible_kpts_is_ignored():
    """A no-visible-keypoints gt must not create a missed detection, and a
    detection matching it must not count as a false positive."""
    gts = [_gt(1, [(50.0, 50.0)], vis=2.0),
           _gt(2, [(70.0, 70.0)], vis=0.0)]       # invisible -> ignore
    ev = CocoEvaluator(gts, iou_type="keypoints")
    # only image 1 predicted, perfectly
    ev.update([{
        "image_id": 1, "boxes": gts[0]["boxes"],
        "scores": np.asarray([0.9]), "labels": np.asarray([1]),
        "keypoints": gts[0]["keypoints"]}])
    # image 2: a detection landing inside the ignored gt's expanded box
    ev.update([{
        "image_id": 2, "boxes": gts[1]["boxes"],
        "scores": np.asarray([0.8]), "labels": np.asarray([1]),
        "keypoints": gts[1]["keypoints"]}])
    ev.accumulate()
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)


def test_keypoints_requires_fields():
    with pytest.raises(ValueError):
        CocoEvaluator([{"image_id": 1,
                        "boxes": np.zeros((1, 4)),
                        "labels": np.ones(1, np.int64)}],
                      iou_type="keypoints")
    with pytest.raises(ValueError):
        CocoEvaluator([], iou_type="segm")


def test_keypoint_eval_empty_annotation_image():
    """An image with zero annotations (empty keypoints) plus a detection on
    it must evaluate, not crash (review finding: IndexError pre-fix)."""
    gts = [_gt(1, [(50.0, 50.0)]),
           {"image_id": 2, "boxes": np.zeros((0, 4)),
            "labels": np.zeros(0, np.int64), "areas": np.zeros(0),
            "keypoints": []}]
    ev = CocoEvaluator(gts, iou_type="keypoints")
    ev.update([{
        "image_id": 1, "boxes": gts[0]["boxes"],
        "scores": np.asarray([0.9]), "labels": np.asarray([1]),
        "keypoints": gts[0]["keypoints"]}])
    # spurious detection on the empty image, scored ABOVE the true positive
    # (a lower-scored trailing FP would not dent COCO AP: the precision
    # envelope at full recall ignores it)
    ev.update([{
        "image_id": 2, "boxes": np.asarray([[10.0, 10.0, 40.0, 40.0]]),
        "scores": np.asarray([0.95]), "labels": np.asarray([1]),
        "keypoints": np.stack([_person((25.0, 25.0))])}])
    ev.accumulate()
    stats = ev.summarize()
    assert 0.0 < stats["AP"] < 1.0  # the leading FP costs precision


def test_keypoint_flat_coco_rows_accepted():
    """COCO-flat (N, 3K) keypoints normalize to (N, K, 3)."""
    flat = _person((50.0, 50.0)).reshape(1, -1)  # (1, 51)
    gts = [{"image_id": 1,
            "boxes": np.asarray([[20.0, 20.0, 80.0, 80.0]]),
            "labels": np.ones(1, np.int64), "areas": np.asarray([3600.0]),
            "keypoints": flat}]
    ev = CocoEvaluator(gts, iou_type="keypoints")
    ev.update([{
        "image_id": 1, "boxes": gts[0]["boxes"],
        "scores": np.asarray([0.9]), "labels": np.asarray([1]),
        "keypoints": flat}])
    ev.accumulate()
    assert ev.summarize()["AP"] == pytest.approx(1.0)


def test_keypoint_dt_area_from_extent():
    """Detection area for range filtering comes from the keypoint extent
    (pycocotools loadRes), not any supplied box: a detection with a huge
    box but a medium keypoint spread counts in the 'medium' range."""
    kp = np.zeros((1, 17, 3))
    kp[0, :, 2] = 2.0
    kp[0, :, 0] = np.linspace(100.0, 150.0, 17)   # 50 x 50 extent: medium
    kp[0, :, 1] = np.linspace(100.0, 150.0, 17)
    gts = [{"image_id": 1,
            "boxes": np.asarray([[100.0, 100.0, 150.0, 150.0]]),
            "labels": np.ones(1, np.int64),
            "areas": np.asarray([2500.0]),        # medium gt
            "keypoints": kp}]
    ev = CocoEvaluator(gts, iou_type="keypoints")
    ev.update([{
        "image_id": 1,
        "boxes": np.asarray([[0.0, 0.0, 500.0, 500.0]]),  # huge box
        "scores": np.asarray([0.9]), "labels": np.asarray([1]),
        "keypoints": kp}])
    ev.accumulate()
    stats = ev.summarize()
    assert stats["APm"] == pytest.approx(1.0)      # matched in medium range


def test_get_coco_kp_ground_truth_feeds_evaluator(tmp_path):
    """ground_truth_for_eval of a keypoints dataset carries the keypoints
    field the evaluator requires (review finding: missing pre-fix)."""
    import json

    from demonet_tpu.data.coco import CocoDetection

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg",
                    "height": 100, "width": 100}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1,
            "bbox": [10, 10, 40, 40], "area": 1600.0, "iscrowd": 0,
            "keypoints": [30.0, 30.0, 2.0] * 17, "num_keypoints": 17}],
        "categories": [{"id": 1, "name": "person"}],
    }
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    ds = CocoDetection(str(img_dir), str(ann_file), return_keypoints=True)
    gts = ds.ground_truth_for_eval()
    assert gts[0]["keypoints"].shape == (1, 17, 3)
    ev = CocoEvaluator(gts, iou_type="keypoints")
    ev.update([{
        "image_id": 1, "boxes": gts[0]["boxes"],
        "scores": np.asarray([0.9]), "labels": np.asarray([1]),
        "keypoints": gts[0]["keypoints"]}])
    ev.accumulate()
    assert ev.summarize()["AP"] == pytest.approx(1.0)


def test_oks_zero_visible_gt_uses_unclipped_bbox():
    """pycocotools computeOks expands the RAW annotation bbox for
    zero-visible-keypoint gts; gts clipped to image bounds must not change
    the expanded-box fallback (advisor r2 finding re coco.py clip)."""
    def make_ev(with_unclipped):
        g = {
            "image_id": 1,
            "boxes": np.asarray([[0.0, 0.0, 60.0, 60.0]]),  # clipped
            "labels": np.ones(1, np.int64),
            "areas": np.asarray([10000.0]),
            "keypoints": _person((0.0, 0.0), vis=0.0)[None],
        }
        if with_unclipped:
            g["boxes_unclipped"] = np.asarray([[-40.0, -40.0, 60.0, 60.0]])
        ev = CocoEvaluator([g], iou_type="keypoints")
        ev.update([{
            "image_id": 1,
            "boxes": np.zeros((1, 4)),
            "scores": np.asarray([0.9]),
            "labels": np.ones(1, np.int64),
            # dt inside the 2x-expanded UNCLIPPED box ([-140,160]^2) but
            # far outside the 2x-expanded clipped box ([-60,120]^2)
            "keypoints": _person((150.0, 150.0))[None],
        }])
        return ev

    res_u = make_ev(True)._evaluate_cat_img(1, 1)
    res_c = make_ev(False)._evaluate_cat_img(1, 1)
    # zero-visible gt is an ignore region: with the unclipped box the dt
    # lands inside it (OKS = 1 -> matched-to-ignore -> dt ignored); with
    # only the clipped box the OKS collapses and the dt stays a candidate FP
    # area-range 0 is "all": ignore there can only come from the gt match
    # (other ranges also ignore via the dt's zero keypoint-extent area)
    assert res_u["dt_ignore"][0].all()
    assert not res_c["dt_ignore"][0].any()


def test_get_coco_kp_carries_unclipped_boxes(tmp_path):
    """CocoDetection.ground_truth_for_eval exposes boxes_unclipped when
    keypoints are requested, with the raw (unclipped) annotation extent."""
    import json

    from PIL import Image

    from demonet_tpu.data.coco import CocoDetection

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (100, 100)).save(img_dir / "a.jpg")
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg",
                    "height": 100, "width": 100}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1,
            "bbox": [-40.0, -40.0, 100.0, 100.0],  # xywh, extends past edge
            "area": 10000.0, "iscrowd": 0,
            "keypoints": [0.0, 0.0, 0.0] * 17, "num_keypoints": 0,
        }],
        "categories": [{"id": 1, "name": "person"}],
    }
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    ds = CocoDetection(str(img_dir), str(ann_file), return_keypoints=True)
    gt = ds.ground_truth_for_eval()[0]
    np.testing.assert_allclose(gt["boxes_unclipped"],
                               [[-40.0, -40.0, 60.0, 60.0]])
    np.testing.assert_allclose(gt["boxes"], [[0.0, 0.0, 60.0, 60.0]])
