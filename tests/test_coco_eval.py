"""Golden validation of the from-scratch numpy COCO evaluator.

No pycocotools exists in this image, so the expected values below are
hand-derived from the published COCOeval protocol (greedy score-descending
matching, crowd = ignore regions with intersection-over-det-area overlap,
area-range gt/dt gating, 101-point interpolated precision sampled with
searchsorted-left on the recall grid, maxDets per-image truncation).
Each case documents its derivation so a reviewer can re-check by hand;
collectively they pin every protocol branch. A randomized cross-check
against the round-1 scalar matcher (transcribed below as the oracle)
guards the vectorized implementation.
"""

from __future__ import annotations

import numpy as np
import pytest

from demonet_tpu.data.coco_eval import (
    AREA_RANGES,
    IOU_THRS,
    CocoEvaluator,
    _iou_xyxy,
)


def _run(gts, dets, cats=None):
    ev = CocoEvaluator(gts, category_ids=cats)
    ev.update(dets)
    ev.accumulate()
    return ev.summarize()


def _check(stats, expected):
    for k, v in expected.items():
        assert stats[k] == pytest.approx(v, abs=1e-9), (
            k, stats[k], v)


def test_golden_basic_tp_fp():
    """2 gt, 2 exact TPs + 1 disjoint FP ranked last.

    rc=[.5,1,1], pr=[1,1,2/3]; envelope [1,1,2/3]; searchsorted-left puts
    every recall point at precision 1 -> AP=1 at all thresholds. Both gts
    are small (area 100): medium/large have no gt -> -1. AR@1 sees only
    the top det -> recall .5.
    """
    gts = [{"image_id": 1,
            "boxes": [[0, 0, 10, 10], [20, 20, 30, 30]],
            "labels": [1, 1]}]
    dets = [{"image_id": 1,
             "boxes": [[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]],
             "scores": [0.9, 0.8, 0.7],
             "labels": [1, 1, 1]}]
    _check(_run(gts, dets), {
        "AP": 1.0, "AP50": 1.0, "AP75": 1.0,
        "APs": 1.0, "APm": -1.0, "APl": -1.0,
        "AR1": 0.5, "AR10": 1.0, "AR100": 1.0,
        "ARs": 1.0, "ARm": -1.0, "ARl": -1.0})


def test_golden_crowd_is_ignore_region():
    """Crowd gt absorbs an otherwise-FP detection via IoU=inter/det_area.

    D1 (s=.9) covers 1/4 of the crowd box: normal IoU would be .25 (no
    match at any threshold -> FP -> AP=.5); crowd overlap is 100/100=1.0,
    so D1 matches the crowd and is ignored. D2 (s=.8) is an exact TP.
    rc=[0,1], pr=[0,1], envelope [1,1] -> AP=1. AR@1 sees only the
    ignored D1 -> recall 0.
    """
    gts = [{"image_id": 1,
            "boxes": [[0, 0, 10, 10], [20, 20, 40, 40]],
            "labels": [1, 1],
            "iscrowd": [False, True]}]
    dets = [{"image_id": 1,
             "boxes": [[20, 20, 30, 30], [0, 0, 10, 10]],
             "scores": [0.9, 0.8],
             "labels": [1, 1]}]
    _check(_run(gts, dets), {
        "AP": 1.0, "AP50": 1.0, "AP75": 1.0,
        "APs": 1.0, "APm": -1.0, "APl": -1.0,
        "AR1": 0.0, "AR10": 1.0, "AR100": 1.0,
        "ARs": 1.0, "ARm": -1.0, "ARl": -1.0})


def test_golden_area_range_gating():
    """Area ranges gate both gts (num_gt, ignore) and unmatched dets.

    gt: G1 medium (40x40=1600), G2 large (100x100=10000).
    dt: D0 s=.95 disjoint large FP, D1 s=.9 = G1, D2 s=.8 = G2,
        D3 s=.7 disjoint small FP.
    all:    tps=[0,1,1,0], fps=[1,0,0,1], num_gt=2 ->
            rc=[0,.5,1,1], pr=[0,.5,2/3,.5], envelope [2/3,2/3,2/3,.5]
            -> q=2/3 at every recall point -> AP=2/3.
    small:  no gt in range -> -1 (D3 being a small FP changes nothing).
    medium: G2 ignored; D2 matches ignored G2 -> ignored; D0/D3 unmatched
            out-of-range -> ignored; only D1 TP -> AP=1.
    large:  G1 ignored; D1 -> ignored; D0 unmatched IN range -> FP;
            D2 TP. rc=[0,0,1,1], pr=[0,0,.5,.5] -> AP=.5.
    AR1: top det D0 is an FP -> 0.
    """
    gts = [{"image_id": 1,
            "boxes": [[0, 0, 40, 40], [0, 0, 100, 100]],
            "labels": [1, 1]}]
    dets = [{"image_id": 1,
             "boxes": [[300, 300, 400, 400], [0, 0, 40, 40],
                       [0, 0, 100, 100], [300, 300, 310, 310]],
             "scores": [0.95, 0.9, 0.8, 0.7],
             "labels": [1, 1, 1, 1]}]
    _check(_run(gts, dets), {
        "AP": 2 / 3, "AP50": 2 / 3, "AP75": 2 / 3,
        "APs": -1.0, "APm": 1.0, "APl": 0.5,
        "AR1": 0.0, "AR10": 1.0, "AR100": 1.0,
        "ARs": -1.0, "ARm": 1.0, "ARl": 1.0})


def test_golden_score_tie_stability():
    """Equal scores across images: mergesort keeps image-id order.

    img1's TP and img2's FP both score .5; concat order (sorted image
    ids) puts the TP first. rc=[.5,.5], pr=[1,.5]; recall points <=0.5
    (51 of 101) read precision 1, the rest searchsorted past the end
    -> 0. AP = 51/101. If the tie broke the other way the AP would be
    25.5/101 — this pins the stable order.
    """
    gts = [{"image_id": 1, "boxes": [[0, 0, 10, 10]], "labels": [1]},
           {"image_id": 2, "boxes": [[0, 0, 10, 10]], "labels": [1]}]
    # img2's det has IoU 50/150 = 1/3 < .5 with its gt -> FP everywhere
    dets = [{"image_id": 1, "boxes": [[0, 0, 10, 10]],
             "scores": [0.5], "labels": [1]},
            {"image_id": 2, "boxes": [[5, 0, 15, 10]],
             "scores": [0.5], "labels": [1]}]
    _check(_run(gts, dets), {
        "AP": 51 / 101, "AP50": 51 / 101, "AP75": 51 / 101,
        "APs": 51 / 101, "APm": -1.0, "APl": -1.0,
        "AR1": 0.5, "AR10": 0.5, "AR100": 0.5,
        "ARs": 0.5, "ARm": -1.0, "ARl": -1.0})


def test_golden_maxdets_truncation():
    """The only TP ranks 12th of 12 -> visible at maxDets=100 only.

    11 disjoint FPs (scores .9....7) outrank the exact TP (s=.05).
    maxDet=100: rc ends at 1 -> AR100=1; precision after the TP is 1/12
    and the envelope makes every recall point read 1/12 -> AP=1/12.
    maxDets=1 and 10 truncate the TP away per image -> AR1=AR10=0.
    """
    gts = [{"image_id": 1, "boxes": [[0, 0, 10, 10]], "labels": [1]}]
    fp_boxes = [[20 * k, 20, 20 * k + 10, 30] for k in range(1, 12)]
    fp_scores = [0.9 - 0.02 * k for k in range(11)]
    dets = [{"image_id": 1,
             "boxes": fp_boxes + [[0, 0, 10, 10]],
             "scores": fp_scores + [0.05],
             "labels": [1] * 12}]
    _check(_run(gts, dets), {
        "AP": 1 / 12, "AP50": 1 / 12, "AP75": 1 / 12,
        "APs": 1 / 12, "APm": -1.0, "APl": -1.0,
        "AR1": 0.0, "AR10": 0.0, "AR100": 1.0,
        "ARs": 1.0, "ARm": -1.0, "ARl": -1.0})


def test_golden_empty_image_counts_fps():
    """An image registered with zero annotations still contributes FPs.

    img2 (no gt) has a det at s=.95 outranking img1's TP at s=.9:
    tps=[0,1], fps=[1,0], num_gt=1 -> rc=[0,1], pr=[0,.5],
    envelope [.5,.5] -> AP=.5. Dropping empty images would report 1.0.
    """
    gts = [{"image_id": 1, "boxes": [[0, 0, 10, 10]], "labels": [1]},
           {"image_id": 2, "boxes": np.zeros((0, 4)), "labels": []}]
    dets = [{"image_id": 1, "boxes": [[0, 0, 10, 10]],
             "scores": [0.9], "labels": [1]},
            {"image_id": 2, "boxes": [[0, 0, 10, 10]],
             "scores": [0.95], "labels": [1]}]
    _check(_run(gts, dets), {
        "AP": 0.5, "AP50": 0.5, "AP75": 0.5,
        "APs": 0.5, "APm": -1.0, "APl": -1.0,
        "AR1": 1.0, "AR10": 1.0, "AR100": 1.0,
        "ARs": 1.0, "ARm": -1.0, "ARl": -1.0})


def test_golden_iou_sweep_and_category_mean():
    """Category averaging + the 0.50:0.95 threshold sweep.

    cat1: exact TP -> AP_t=1 for all 10 thresholds.
    cat2: det IoU = 80/120 = 2/3 with its gt -> TP for t in
    {.50,.55,.60,.65} (4 thresholds), FP for the remaining 6.
    AP = mean over (t, cat) = (10*1 + 4*1 + 6*0)/20 = 0.7;
    AP50 = 1, AP75 = (1+0)/2 = 0.5; AR mirrors it.
    """
    gts = [{"image_id": 10, "boxes": [[0, 0, 10, 10]], "labels": [1]},
           {"image_id": 11, "boxes": [[0, 0, 10, 10]], "labels": [2]}]
    dets = [{"image_id": 10, "boxes": [[0, 0, 10, 10]],
             "scores": [0.9], "labels": [1]},
            {"image_id": 11, "boxes": [[0, 2, 10, 12]],
             "scores": [0.9], "labels": [2]}]
    _check(_run(gts, dets), {
        "AP": 0.7, "AP50": 1.0, "AP75": 0.5,
        "APs": 0.7, "APm": -1.0, "APl": -1.0,
        "AR1": 0.7, "AR10": 0.7, "AR100": 0.7,
        "ARs": 0.7, "ARm": -1.0, "ARl": -1.0})


# ---------------------------------------------------------------------------
# Randomized cross-check: vectorized matcher vs the round-1 scalar matcher
# (the triple loop below is the round-1 demonet_tpu implementation, kept
# verbatim as the oracle for the vectorization).
# ---------------------------------------------------------------------------


def _scalar_evaluate_img(ev, cat, img_id, area_rng, max_det):
    gt_all = ev.gts.get(img_id)
    if gt_all is None:
        return None
    gm = gt_all["labels"] == cat
    det = ev.detections.get(
        img_id, {"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
                 "labels": np.zeros(0, np.int64)})
    dm = det["labels"] == cat
    if not gm.any() and not dm.any():
        return None

    g_boxes = gt_all["boxes"][gm]
    g_crowd = gt_all["iscrowd"][gm]
    g_area = gt_all["areas"][gm]
    g_ignore = g_crowd | (g_area < area_rng[0]) | (g_area > area_rng[1])

    g_order = np.argsort(g_ignore, kind="stable")
    g_boxes, g_crowd, g_ignore = (
        g_boxes[g_order], g_crowd[g_order], g_ignore[g_order])

    d_boxes = det["boxes"][dm]
    d_scores = det["scores"][dm]
    d_order = np.argsort(-d_scores, kind="stable")[:max_det]
    d_boxes, d_scores = d_boxes[d_order], d_scores[d_order]

    ious = _iou_xyxy(d_boxes, g_boxes, g_crowd)

    t_n, d_n, g_n = len(IOU_THRS), len(d_boxes), len(g_boxes)
    dtm = np.zeros((t_n, d_n), np.int64) - 1
    gtm = np.zeros((t_n, g_n), np.int64) - 1
    for ti, t in enumerate(IOU_THRS):
        for di in range(d_n):
            best = min(t, 1 - 1e-10)
            m = -1
            for gi in range(g_n):
                if gtm[ti, gi] >= 0 and not g_crowd[gi]:
                    continue
                if m > -1 and not g_ignore[m] and g_ignore[gi]:
                    break
                if ious[di, gi] < best:
                    continue
                best = ious[di, gi]
                m = gi
            if m > -1:
                dtm[ti, di] = m
                gtm[ti, m] = di

    d_area = (d_boxes[:, 2] - d_boxes[:, 0]) * (d_boxes[:, 3] - d_boxes[:, 1])
    d_oor = (d_area < area_rng[0]) | (d_area > area_rng[1])
    dt_ignore = np.zeros((t_n, d_n), bool)
    for ti in range(t_n):
        matched = dtm[ti] >= 0
        ig = np.zeros(d_n, bool)
        ig[matched] = g_ignore[dtm[ti, matched]]
        ig[~matched] = d_oor[~matched]
        dt_ignore[ti] = ig

    return {
        "dt_scores": d_scores,
        "dt_matched": dtm >= 0,
        "dt_ignore": dt_ignore,
        "num_gt": int((~g_ignore).sum()),
    }


def _random_case(rng, n_imgs=6, n_cats=3):
    gts, dets = [], []
    for img_id in range(n_imgs):
        n_g = int(rng.integers(0, 6))
        wh = rng.uniform(4, 120, (n_g, 2))
        xy = rng.uniform(0, 200, (n_g, 2))
        g_boxes = np.concatenate([xy, xy + wh], axis=1)
        gts.append({
            "image_id": img_id,
            "boxes": g_boxes,
            "labels": rng.integers(1, n_cats + 1, n_g),
            "iscrowd": rng.random(n_g) < 0.25,
        })
        n_d = int(rng.integers(0, 10))
        # half the detections are jittered copies of gt boxes (IoU ties
        # and near-threshold overlaps), half are random
        d_boxes = []
        for _ in range(n_d):
            if n_g and rng.random() < 0.5:
                b = g_boxes[rng.integers(0, n_g)] + rng.normal(0, 3, 4)
            else:
                xy1 = rng.uniform(0, 200, 2)
                b = np.concatenate([xy1, xy1 + rng.uniform(4, 120, 2)])
            d_boxes.append(b)
        d_boxes = (np.asarray(d_boxes).reshape(-1, 4)
                   if d_boxes else np.zeros((0, 4)))
        # quantized scores to force ties
        scores = np.round(rng.random(n_d), 1)
        dets.append({
            "image_id": img_id,
            "boxes": d_boxes,
            "scores": scores,
            "labels": rng.integers(1, n_cats + 1, n_d),
        })
    return gts, dets


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_vectorized_match_equals_scalar_oracle(seed):
    rng = np.random.default_rng(seed)
    gts, dets = _random_case(rng)
    ev = CocoEvaluator(gts, category_ids=[1, 2, 3])
    ev.update(dets)
    for cat in ev.category_ids:
        for img_id in range(len(gts)):
            vec = ev._evaluate_cat_img(cat, img_id)
            for ai, rng_a in enumerate(AREA_RANGES.values()):
                ref = _scalar_evaluate_img(ev, cat, img_id, rng_a, 100)
                if ref is None:
                    assert vec is None
                    continue
                np.testing.assert_array_equal(
                    vec["dt_scores"], ref["dt_scores"])
                np.testing.assert_array_equal(
                    vec["dt_matched"][ai], ref["dt_matched"])
                np.testing.assert_array_equal(
                    vec["dt_ignore"][ai], ref["dt_ignore"])
                assert int(vec["num_gt"][ai]) == ref["num_gt"]


def test_eval_scales_to_val2017_size():
    """1000 images x 20 cats x ~20 dets each evaluates in seconds (the
    full 5k-image val2017-scale run is measured by
    tools/bench_coco_eval.py and recorded in DESIGN.md)."""
    import time

    rng = np.random.default_rng(0)
    n_imgs, n_cats = 1000, 20
    gts, dets = [], []
    for img_id in range(n_imgs):
        n_g = int(rng.integers(1, 8))
        wh = rng.uniform(8, 200, (n_g, 2))
        xy = rng.uniform(0, 400, (n_g, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1)
        labels = rng.integers(1, n_cats + 1, n_g)
        gts.append({"image_id": img_id, "boxes": boxes, "labels": labels,
                    "iscrowd": rng.random(n_g) < 0.05})
        n_d = 20
        db = []
        for _ in range(n_d):
            b = boxes[rng.integers(0, n_g)] + rng.normal(0, 8, 4)
            db.append(b)
        dets.append({"image_id": img_id,
                     "boxes": np.asarray(db),
                     "scores": rng.random(n_d),
                     "labels": rng.integers(1, n_cats + 1, n_d)})
    ev = CocoEvaluator(gts, category_ids=list(range(1, n_cats + 1)))
    ev.update(dets)
    t0 = time.monotonic()
    ev.accumulate()
    stats = ev.summarize()
    dt = time.monotonic() - t0
    assert stats["AP"] > -1
    assert dt < 30, f"accumulate+summarize took {dt:.1f}s"


def test_pack_unpack_detections_roundtrip():
    """The pickle-free merge transport is bit-exact, keypoints included."""
    from demonet_tpu.data.coco_eval import _pack_detections, _unpack_detections

    rng = np.random.default_rng(3)
    dets = {}
    for img_id in (3, 17, 200000):
        n = int(rng.integers(0, 6))
        dets[img_id] = {
            "boxes": rng.random((n, 4)) * 640,
            "scores": rng.random(n),
            "labels": rng.integers(1, 91, n).astype(np.int64),
        }
    # one image with keypoints, one with zero detections
    dets[42] = {
        "boxes": rng.random((2, 4)) * 640,
        "scores": rng.random(2),
        "labels": np.asarray([1, 1], np.int64),
        "keypoints": rng.random((2, 17, 3)),
    }
    buf = _pack_detections(dets)
    assert buf.dtype == np.uint8
    out = _unpack_detections(buf)
    assert sorted(out) == sorted(dets)
    for img_id, d in dets.items():
        for key, v in d.items():
            got = out[img_id][key]
            assert got.dtype == np.asarray(v).dtype or key != "labels"
            np.testing.assert_array_equal(
                got, np.asarray(v, got.dtype), err_msg=f"{img_id}/{key}")
    assert "keypoints" in out[42] and "keypoints" not in out[3]


def test_pack_unpack_detections_empty():
    from demonet_tpu.data.coco_eval import _pack_detections, _unpack_detections

    assert _unpack_detections(_pack_detections({})) == {}
