#!/usr/bin/env python
"""Pack ground-truth boxes/labels for the val bench frames
(bench_assets/val_gt_320.npz, a few KB).

VERDICT r4 weak #4: bench.py's train-step rows used a single tiled
degenerate box per image, under-exercising matcher/hard-negative-mining
memory traffic. This asset carries the REAL shapes-corpus val GT for the
same frames as bench_assets/val_images_320.npz (same image order:
ann["images"][:n], boxes rescaled to the 320x320 network frame), so the
shipped train-step timing sees a realistic match/HNM distribution.

    python tools/export_bench_gt.py /root/repo/.data/shapes 192 \
        bench_assets/val_gt_320.npz
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

MAX_GT = 8  # shapes corpus draws 1-4 instances per image


def load_bench_gt(path, batch):
    """npz -> dict of (batch, G, 4) boxes, (batch, G) labels, (batch, G)
    valid, tiled in the same order as load_bench_images."""
    with np.load(path, allow_pickle=False) as z:
        boxes, labels, valid = z["boxes"], z["labels"], z["valid"]
    idx = np.arange(batch) % len(boxes)
    return {"gt_boxes": boxes[idx], "gt_labels": labels[idx],
            "gt_valid": valid[idx]}


def main():
    root, n, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    ann = json.load(open(os.path.join(
        root, "annotations", "instances_val2017.json")))
    by_img = {}
    for a in ann["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)
    boxes = np.zeros((n, MAX_GT, 4), np.float32)
    labels = np.zeros((n, MAX_GT), np.int32)
    valid = np.zeros((n, MAX_GT), bool)
    for i, info in enumerate(ann["images"][:n]):
        sx, sy = 320.0 / info["width"], 320.0 / info["height"]
        for j, a in enumerate(by_img.get(info["id"], [])[:MAX_GT]):
            x, y, w, h = a["bbox"]
            boxes[i, j] = [x * sx, y * sy, (x + w) * sx, (y + h) * sy]
            labels[i, j] = a["category_id"]
            valid[i, j] = True
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, boxes=boxes, labels=labels, valid=valid)
    print(f"wrote {out} ({os.path.getsize(out) / 1e3:.1f} KB, {n} frames, "
          f"{int(valid.sum())} instances)")


if __name__ == "__main__":
    main()
