"""Measure CocoEvaluator host time at val2017 scale.

5000 images, 80 categories, 100 detections/image (the maxDets ceiling) —
the worst realistic shape for a full COCO eval epoch. Round-1's scalar
matcher was minutes-to-hours at this scale (VERDICT.md weak #4); the
vectorized matcher batches the 10 IoU thresholds x 4 area ranges per
detection scan.

    python tools/bench_coco_eval.py [--images 5000] [--dets 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demonet_tpu.data.coco_eval import CocoEvaluator  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=5000)
    p.add_argument("--dets", type=int, default=100)
    p.add_argument("--cats", type=int, default=80)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    gts, dets = [], []
    for img_id in range(args.images):
        n_g = int(rng.integers(1, 16))  # val2017 averages ~7.3 anns/img
        wh = rng.uniform(8, 300, (n_g, 2))
        xy = rng.uniform(0, 500, (n_g, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1)
        labels = rng.integers(1, args.cats + 1, n_g)
        gts.append({"image_id": img_id, "boxes": boxes, "labels": labels,
                    "iscrowd": rng.random(n_g) < 0.03})
        idx = rng.integers(0, n_g, args.dets)
        db = boxes[idx] + rng.normal(0, 10, (args.dets, 4))
        dets.append({"image_id": img_id, "boxes": db,
                     "scores": rng.random(args.dets),
                     "labels": labels[idx]})

    ev = CocoEvaluator(gts, category_ids=list(range(1, args.cats + 1)))
    t0 = time.monotonic()
    ev.update(dets)
    t_update = time.monotonic() - t0
    t0 = time.monotonic()
    ev.accumulate()
    t_acc = time.monotonic() - t0
    t0 = time.monotonic()
    stats = ev.summarize()
    t_sum = time.monotonic() - t0
    print(f"\nimages={args.images} cats={args.cats} dets/img={args.dets}")
    print(f"update    : {t_update:7.2f}s")
    print(f"accumulate: {t_acc:7.2f}s")
    print(f"summarize : {t_sum:7.2f}s")
    print(f"TOTAL     : {t_update + t_acc + t_sum:7.2f}s  (AP={stats['AP']:.3f})")


if __name__ == "__main__":
    main()
