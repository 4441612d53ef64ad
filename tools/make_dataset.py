"""Synthesize an on-disk COCO-format JPEG detection corpus.

Produces the reference's expected train2017/val2017 layout
(reference demonet/data/coco.py:226-252): real JPEG files on disk plus
instances_{train,val}2017.json, so `python -m demonet_tpu.train
--dataset coco --data-path <root>` exercises the full production chain —
JPEG decode, multi-worker loader, augmentations, chip training, numpy COCO
eval — with exactly known ground truth.

Six visually distinctive object classes (colored geometric shapes with
per-instance rotation/scale jitter) composited onto smooth noise
backgrounds; boxes are the exact drawn extent. Deterministic per seed.

    python tools/make_dataset.py --root /data/shapes --train 1500 --val 200
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLASSES = ["disc", "box", "wedge", "star", "ring", "cross"]  # ids 1..6

BASE_COLORS = {
    "disc": (215, 40, 40),
    "box": (40, 180, 60),
    "wedge": (50, 80, 230),
    "star": (235, 200, 30),
    "ring": (200, 40, 200),
    "cross": (30, 200, 210),
}


def _background(rng, w, h):
    """Smooth low-frequency noise so backgrounds are non-trivial."""
    low = rng.integers(40, 216, (6, 8, 3)).astype(np.float32)
    from PIL import Image

    img = Image.fromarray(low.astype(np.uint8), "RGB").resize(
        (w, h), Image.BILINEAR)
    arr = np.asarray(img, np.float32)
    arr += rng.normal(0, 8, arr.shape)
    return np.clip(arr, 0, 255).astype(np.uint8)


def _poly_star(cx, cy, r, rot, points=5):
    out = []
    for k in range(points * 2):
        rad = r if k % 2 == 0 else r * 0.45
        a = rot + k * math.pi / points
        out.append((cx + rad * math.cos(a), cy + rad * math.sin(a)))
    return out


def _poly_wedge(cx, cy, r, rot):
    return [(cx + r * math.cos(rot + k * 2 * math.pi / 3),
             cy + r * math.sin(rot + k * 2 * math.pi / 3)) for k in range(3)]


def _poly_box(cx, cy, r, rot):
    return [(cx + r * math.cos(rot + math.pi / 4 + k * math.pi / 2),
             cy + r * math.sin(rot + math.pi / 4 + k * math.pi / 2))
            for k in range(4)]


def _poly_cross(cx, cy, r, rot):
    t = r * 0.34  # half arm thickness
    pts = [(-r, -t), (-t, -t), (-t, -r), (t, -r), (t, -t), (r, -t),
           (r, t), (t, t), (t, r), (-t, r), (-t, t), (-r, t)]
    c, s = math.cos(rot), math.sin(rot)
    return [(cx + x * c - y * s, cy + x * s + y * c) for x, y in pts]


def _draw_instance(draw, rng, cls, cx, cy, r):
    """Draw one instance, return its exact xyxy bbox."""
    jitter = rng.integers(-30, 31, 3)
    color = tuple(int(np.clip(c + j, 0, 255))
                  for c, j in zip(BASE_COLORS[cls], jitter))
    rot = float(rng.random() * 2 * math.pi)
    if cls == "disc":
        draw.ellipse([cx - r, cy - r, cx + r, cy + r], fill=color)
        return [cx - r, cy - r, cx + r, cy + r]
    if cls == "ring":
        width = max(3, int(r * 0.3))
        draw.ellipse([cx - r, cy - r, cx + r, cy + r],
                     outline=color, width=width)
        return [cx - r, cy - r, cx + r, cy + r]
    poly = {"box": _poly_box, "wedge": _poly_wedge, "star": _poly_star,
            "cross": _poly_cross}[cls](cx, cy, r, rot)
    draw.polygon(poly, fill=color)
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    return [min(xs), min(ys), max(xs), max(ys)]


def make_split(root, split, n_images, seed):
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, f"{split}2017")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img_id = i + 1
        w = int(rng.integers(320, 513))
        h = int(rng.integers(256, 481))
        arr = _background(rng, w, h)
        img = Image.fromarray(arr, "RGB")
        draw = ImageDraw.Draw(img)
        for _ in range(int(rng.integers(1, 5))):
            cls_idx = int(rng.integers(0, len(CLASSES)))
            cls = CLASSES[cls_idx]
            r = float(rng.uniform(22, min(w, h) * 0.28))
            cx = float(rng.uniform(r, w - r))
            cy = float(rng.uniform(r, h - r))
            bbox = _draw_instance(draw, rng, cls, cx, cy, r)
            x1, y1, x2, y2 = bbox
            x1, y1 = max(0.0, x1), max(0.0, y1)
            x2, y2 = min(float(w), x2), min(float(h), y2)
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": cls_idx + 1,
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": (x2 - x1) * (y2 - y1),
                "iscrowd": 0, "segmentation": [],
            })
            ann_id += 1
        fname = f"{img_id:012d}.jpg"
        img.save(os.path.join(img_dir, fname), quality=88)
        images.append({"id": img_id, "file_name": fname,
                       "height": h, "width": w})
        if (i + 1) % 200 == 0:
            print(f"{split}: {i + 1}/{n_images}")

    meta = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": k + 1, "name": c, "supercategory": "shape"}
                       for k, c in enumerate(CLASSES)],
    }
    out = os.path.join(root, "annotations", f"instances_{split}2017.json")
    with open(out, "w") as f:
        json.dump(meta, f)
    print(f"{split}: {len(images)} images, {len(annotations)} instances "
          f"-> {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--train", default=1500, type=int)
    p.add_argument("--val", default=200, type=int)
    p.add_argument("--seed", default=0, type=int)
    args = p.parse_args()
    make_split(args.root, "train", args.train, args.seed)
    make_split(args.root, "val", args.val, args.seed + 1)


if __name__ == "__main__":
    main()
