#!/usr/bin/env python
"""Loader scaling measurement (VERDICT r2 weak #6): measured worker-count
curve on the real on-disk JPEG corpus, plus a per-batch cost split
(decode vs augmentations vs batch assembly) — replacing round 2's
x-cores extrapolation with data.

Run on an otherwise-idle host:
    python tools/bench_loader.py --root .data/shapes [--batches 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def measure_loader(ds, workers, batch_size, batches, image_size=(320, 320)):
    from demonet_tpu.data.loader import DetectionLoader

    ld = DetectionLoader(ds, batch_size=batch_size, image_size=image_size,
                         shuffle=True, seed=1, num_workers=workers,
                         prefetch=2)
    it = iter(ld)
    next(it)  # warm the pool / prefetch
    t0 = time.perf_counter()
    n = 0
    for _ in range(batches - 1):
        try:
            next(it)
            n += batch_size
        except StopIteration:
            break
    dt = time.perf_counter() - t0
    # drain remaining prefetched batches so worker processes exit cleanly
    for _ in it:
        pass
    return n / dt


def cost_split(ds, n=64):
    """Per-image ms: decode-only, decode+augment, + assembly copy."""
    from demonet_tpu.data.coco import _load_image
    from demonet_tpu.data.loader import _assemble_batch, _rng_aware

    idxs = np.arange(n) % len(ds)
    t0 = time.perf_counter()
    for i in idxs:
        info = ds.images[ds.ids[int(i)]]
        _load_image(os.path.join(ds.img_folder, info["file_name"]))
    decode_ms = (time.perf_counter() - t0) / n * 1000

    t0 = time.perf_counter()
    for i in idxs:
        ds.__getitem__(int(i), rng=np.random.default_rng(int(i)))
    item_ms = (time.perf_counter() - t0) / n * 1000

    t0 = time.perf_counter()
    _assemble_batch(ds, idxs, len(idxs), (320, 320), 100, 0, 0,
                    _rng_aware(ds))
    assemble_ms = (time.perf_counter() - t0) / n * 1000
    return decode_ms, item_ms - decode_ms, assemble_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=".data/shapes")
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 1, 2, 4])
    ap.add_argument("--augmentation", default="ssd", choices=["hflip", "ssd"])
    args = ap.parse_args()

    from demonet_tpu.data.coco import get_coco
    from demonet_tpu.data.presets import DetectionPresetTrain

    ds = get_coco(args.root, "train",
                  DetectionPresetTrain(args.augmentation))
    print(f"corpus: {len(ds)} images, aug={args.augmentation}, "
          f"b{args.batch_size}, {args.batches} batches, "
          f"{os.cpu_count()} host cores")

    d, a, c = cost_split(ds)
    print(f"cost split per image: decode+resize {d:.1f} ms, "
          f"augmentations {a:.1f} ms, full assembly {c:.1f} ms "
          "(assembly includes decode+aug; deltas below cache noise)")

    for w in args.workers:
        rate = measure_loader(ds, w, args.batch_size, args.batches)
        label = "thread-prefetch" if w == 0 else f"{w} worker procs"
        print(f"{label}: {rate:.1f} img/s")


if __name__ == "__main__":
    main()
