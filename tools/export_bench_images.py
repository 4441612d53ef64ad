#!/usr/bin/env python
"""Pack a fixed set of val-split JPEGs as the trained-weights bench input
asset (bench_assets/val_images_320.npz, JPEG bytes — a couple of MB).

Trained-weights serving must be measured on REAL images: random noise
under a trained model scores everything as background, which overstates
the sparsity the chunk-skipping top-k exploits; real frames carry real
detections per image.

    python tools/export_bench_images.py /root/repo/.data/shapes 64 \
        bench_assets/val_images_320.npz
"""

from __future__ import annotations

import io
import json
import os
import sys

import numpy as np


def load_bench_images(path, batch):
    """npz of JPEG bytes -> (batch, 320, 320, 3) float32 in [0, 1]."""
    from PIL import Image

    with np.load(path, allow_pickle=False) as z:
        blobs = [z[k] for k in sorted(z.files)]
    imgs = []
    for blob in blobs:
        img = Image.open(io.BytesIO(blob.tobytes())).convert("RGB")
        imgs.append(np.asarray(img, np.float32) / 255.0)
    arr = np.stack(imgs)
    reps = -(-batch // len(arr))
    return np.tile(arr, (reps, 1, 1, 1))[:batch]


def main():
    root, n, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from PIL import Image

    ann = json.load(open(os.path.join(
        root, "annotations", "instances_val2017.json")))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    blobs = {}
    for i, info in enumerate(ann["images"][:n]):
        img = Image.open(os.path.join(
            root, "val2017", info["file_name"])).convert("RGB")
        img = img.resize((320, 320), Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=88)
        blobs[f"img{i:04d}"] = np.frombuffer(buf.getvalue(), np.uint8)
    np.savez_compressed(out, **blobs)
    print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB, "
          f"{len(blobs)} images)")


if __name__ == "__main__":
    main()
