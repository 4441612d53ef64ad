"""COCO-style mAP evaluation, self-contained numpy (no pycocotools).

Capability parity with the reference's CocoEvaluator
(demonet/data/coco_eval.py:23-352), which wraps pycocotools' COCOeval. This
image ships no pycocotools, so the COCO bbox evaluation protocol is
implemented from its published semantics:

  * IoU thresholds 0.50:0.05:0.95 (10), recall thresholds 0:0.01:1 (101)
  * area ranges all / small(<32^2) / medium / large, maxDets 1/10/100
  * greedy score-descending matching per (category, image); crowd ground
    truths are ignore-regions that may match many detections and use
    intersection-over-detection-area instead of IoU
  * precision envelope (monotone non-increasing) sampled at the recall grid
  * the standard 12-number summary printout

`synchronize_between_processes` merges detections across hosts with
array all-gather and de-duplicates repeated image ids from padded sharding —
same dedup semantics as the reference (coco_eval.py:183-184).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _iou_xyxy(dt: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """Pairwise IoU; for crowd gt, intersection / detection area."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    lt = np.maximum(dt[:, None, :2], gt[None, :, :2])
    rb = np.minimum(dt[:, None, 2:], gt[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = (dt[:, 2] - dt[:, 0]) * (dt[:, 3] - dt[:, 1])
    area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    union = area_d[:, None] + area_g[None, :] - inter
    union = np.where(iscrowd[None, :], area_d[:, None], union)
    return inter / np.maximum(union, 1e-10)


class CocoEvaluator:
    """Accumulates detections and computes COCO bbox mAP.

    Ground truth is registered once at construction as per-image dicts:
      {'image_id', 'boxes' (N,4 xyxy), 'labels' (N,), 'iscrowd' (N,),
       'areas' (N,)}  — 'areas' defaults to box area when absent.
    Detections arrive via update() as
      {'image_id', 'boxes' (M,4 xyxy), 'scores' (M,), 'labels' (M,)}.
    """

    def __init__(self, ground_truth: Iterable[Dict],
                 category_ids: Optional[Sequence[int]] = None):
        self.gts: Dict[int, Dict] = {}
        cats = set()
        for g in ground_truth:
            img_id = int(g["image_id"])
            boxes = np.asarray(g["boxes"], np.float64).reshape(-1, 4)
            labels = np.asarray(g["labels"], np.int64).reshape(-1)
            iscrowd = np.asarray(
                g.get("iscrowd", np.zeros(len(labels))), bool).reshape(-1)
            areas = g.get("areas")
            if areas is None:
                areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            areas = np.asarray(areas, np.float64).reshape(-1)
            self.gts[img_id] = {
                "boxes": boxes, "labels": labels,
                "iscrowd": iscrowd, "areas": areas}
            cats.update(labels.tolist())
        self.category_ids = sorted(category_ids) if category_ids is not None \
            else sorted(cats)
        self.detections: Dict[int, Dict] = {}
        self._eval = None
        self.stats: Optional[np.ndarray] = None

    def update(self, results: Iterable[Dict]) -> None:
        for r in results:
            img_id = int(r["image_id"])
            det = {
                "boxes": np.asarray(r["boxes"], np.float64).reshape(-1, 4),
                "scores": np.asarray(r["scores"], np.float64).reshape(-1),
                "labels": np.asarray(r["labels"], np.int64).reshape(-1),
            }
            # last write wins; dedup of repeated ids from padded distributed
            # sharding (reference coco_eval.py:183-184 keeps unique ids)
            self.detections[img_id] = det

    def synchronize_between_processes(self) -> None:
        """Merge per-host detection sets (reference coco_eval.py:52-55,
        misc.py:75-115 — but array-native, no pickle)."""
        from demonet_tpu.parallel.dist import process_count

        if process_count() == 1:
            return
        import pickle

        from demonet_tpu.parallel.dist import all_gather_arrays

        payload = pickle.dumps(self.detections)
        n = np.int64(len(payload))
        max_n = int(all_gather_arrays(np.asarray(n)).max())
        buf = np.zeros(max_n, np.uint8)
        buf[:len(payload)] = np.frombuffer(payload, np.uint8)
        sizes = all_gather_arrays(np.asarray(n))
        bufs = all_gather_arrays(buf)
        merged: Dict[int, Dict] = {}
        for size, b in zip(sizes, bufs):
            merged.update(pickle.loads(b[:int(size)].tobytes()))
        self.detections = merged

    # ---- core evaluation ----

    def _evaluate_img(self, cat: int, img_id: int, area_rng, max_det: int):
        gt_all = self.gts.get(img_id)
        if gt_all is None:
            return None
        gm = gt_all["labels"] == cat
        det = self.detections.get(
            img_id, {"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
                     "labels": np.zeros(0, np.int64)})
        dm = det["labels"] == cat
        if not gm.any() and not dm.any():
            return None

        g_boxes = gt_all["boxes"][gm]
        g_crowd = gt_all["iscrowd"][gm]
        g_area = gt_all["areas"][gm]
        g_ignore = g_crowd | (g_area < area_rng[0]) | (g_area > area_rng[1])

        # gts sorted: non-ignored first (COCOeval sorts by _ignore)
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
                    # gt already matched (and not crowd) -> unavailable
                    if gtm[ti, gi] >= 0 and not g_crowd[gi]:
                        continue
                    # have a real-gt match and now reaching ignored gts: stop
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
        d_out_of_range = (d_area < area_rng[0]) | (d_area > area_rng[1])
        # detection ignored if matched to an ignored gt, or unmatched and
        # outside the area range
        dt_ignore = np.zeros((t_n, d_n), bool)
        for ti in range(t_n):
            matched = dtm[ti] >= 0
            ig = np.zeros(d_n, bool)
            ig[matched] = g_ignore[dtm[ti, matched]]
            ig[~matched] = d_out_of_range[~matched]
            dt_ignore[ti] = ig

        return {
            "dt_scores": d_scores,
            "dt_matched": dtm >= 0,
            "dt_ignore": dt_ignore,
            "num_gt": int((~g_ignore).sum()),
        }

    def _relevant_images(self, cat: int) -> List[int]:
        """Images with any gt or dt of this category (skips the quadratic
        empty-pair walk — pycocotools achieves this via its index)."""
        out = []
        for img_id in sorted(self.gts):
            g = self.gts[img_id]
            d = self.detections.get(img_id)
            if (g["labels"] == cat).any() or (
                    d is not None and (d["labels"] == cat).any()):
                out.append(img_id)
        return out

    def accumulate(self) -> None:
        k_n = len(self.category_ids)
        a_n = len(AREA_RANGES)
        m_n = len(MAX_DETS)
        t_n, r_n = len(IOU_THRS), len(REC_THRS)
        precision = -np.ones((t_n, r_n, k_n, a_n, m_n))
        recall = -np.ones((t_n, k_n, a_n, m_n))
        max_det_all = max(MAX_DETS)

        for ki, cat in enumerate(self.category_ids):
            img_ids = self._relevant_images(cat)
            for ai, (_, rng) in enumerate(AREA_RANGES.items()):
                # match once per (cat, img, area) at the largest maxDet;
                # smaller maxDets are per-image truncations (the pycocotools
                # accumulate convention).
                per_img = [
                    self._evaluate_img(cat, i, rng, max_det_all)
                    for i in img_ids]
                per_img = [e for e in per_img if e is not None]
                if not per_img:
                    continue
                num_gt = sum(e["num_gt"] for e in per_img)
                if num_gt == 0:
                    continue
                for mi, max_det in enumerate(MAX_DETS):
                    scores = np.concatenate(
                        [e["dt_scores"][:max_det] for e in per_img])
                    order = np.argsort(-scores, kind="mergesort")
                    matched = np.concatenate(
                        [e["dt_matched"][:, :max_det] for e in per_img],
                        axis=1)[:, order]
                    ignored = np.concatenate(
                        [e["dt_ignore"][:, :max_det] for e in per_img],
                        axis=1)[:, order]
                    tps = matched & ~ignored
                    fps = ~matched & ~ignored
                    tp_cum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_cum = np.cumsum(fps, axis=1).astype(np.float64)
                    for ti in range(t_n):
                        tp, fp = tp_cum[ti], fp_cum[ti]
                        rc = tp / num_gt
                        pr = tp / np.maximum(tp + fp, np.spacing(1))
                        recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0.0
                        # precision envelope (monotone from the right)
                        pr_env = np.maximum.accumulate(pr[::-1])[::-1]
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(r_n)
                        valid = inds < len(pr_env)
                        q[valid] = pr_env[inds[valid]]
                        precision[ti, :, ki, ai, mi] = q
        self._eval = {"precision": precision, "recall": recall}

    def _summ(self, ap: bool, iou: Optional[float] = None,
              area: str = "all", max_det: int = 100) -> float:
        if self._eval is None:
            raise RuntimeError("accumulate() first")
        ai = list(AREA_RANGES).index(area)
        mi = MAX_DETS.index(max_det)
        if ap:
            s = self._eval["precision"][:, :, :, ai, mi]
            if iou is not None:
                ti = int(np.where(np.isclose(IOU_THRS, iou))[0][0])
                s = s[ti:ti + 1]
        else:
            s = self._eval["recall"][:, :, ai, mi]
            if iou is not None:
                ti = int(np.where(np.isclose(IOU_THRS, iou))[0][0])
                s = s[ti:ti + 1]
        valid = s[s > -1]
        return float(valid.mean()) if valid.size else -1.0

    def summarize(self) -> Dict[str, float]:
        """Print the 12 standard lines; return the stats dict."""
        defs = [
            ("AP", True, None, "all", 100),
            ("AP50", True, 0.5, "all", 100),
            ("AP75", True, 0.75, "all", 100),
            ("APs", True, None, "small", 100),
            ("APm", True, None, "medium", 100),
            ("APl", True, None, "large", 100),
            ("AR1", False, None, "all", 1),
            ("AR10", False, None, "all", 10),
            ("AR100", False, None, "all", 100),
            ("ARs", False, None, "small", 100),
            ("ARm", False, None, "medium", 100),
            ("ARl", False, None, "large", 100),
        ]
        stats = {}
        for name, ap, iou, area, md in defs:
            v = self._summ(ap, iou, area, md)
            stats[name] = v
            kind = "Average Precision" if ap else "Average Recall"
            metric = "(AP)" if ap else "(AR)"
            iou_str = f"{iou:0.2f}     " if iou is not None else "0.50:0.95"
            print(f" {kind:<18} {metric} @[ IoU={iou_str} | "
                  f"area={area:>6s} | maxDets={md:>3d} ] = {v:0.3f}")
        self.stats = np.asarray([stats[d[0]] for d in defs])
        return stats
