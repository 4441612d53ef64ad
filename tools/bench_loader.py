"""Measure input-pipeline throughput on a synthetic-JPEG corpus.

    python tools/bench_loader.py [--images 256] [--batch 64] [--workers 0 2 4]

Covers the three pipeline configurations:
  * python:  PIL/cv2 decode + full SSD augmentation, prefetch thread
  * pool-N:  same work in N spawn worker processes (shared-memory slab)
  * native:  C++ libjpeg decode+resize (eval path, no augmentation)

Publish the measured numbers next to the train-step rate in DESIGN.md —
the loader must outrun the step or training is input-bound.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demonet_tpu.data.loader import DetectionLoader  # noqa: E402
from demonet_tpu.data.presets import DetectionPresetTrain  # noqa: E402
from demonet_tpu.data.synthetic import SyntheticJpegDetection  # noqa: E402


def measure(loader, n_images: int, label: str, warm_batches: int = 2) -> float:
    it = iter(loader)
    for _ in range(warm_batches):
        next(it, None)
    t0 = time.monotonic()
    count = 0
    for batch in it:
        count += int(batch["batch_valid"].sum())
    dt = time.monotonic() - t0
    rate = count / dt if dt > 0 else float("inf")
    print(f"{label:>12}: {rate:8.1f} img/s  ({count} imgs in {dt:.2f}s)")
    return rate


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=256)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, nargs=2, default=(480, 640),
                   help="source image h w (COCO-ish)")
    p.add_argument("--out-size", type=int, nargs=2, default=(320, 320))
    p.add_argument("--workers", type=int, nargs="+", default=[0, 2])
    p.add_argument("--corpus", default="/tmp/demonet_bench_jpegs")
    args = p.parse_args()

    print(f"corpus: {args.images} JPEGs at {args.size[0]}x{args.size[1]}, "
          f"output {args.out_size[0]}x{args.out_size[1]}, "
          f"batch {args.batch}, host cores={os.cpu_count()}")
    ds_aug = SyntheticJpegDetection(
        args.corpus, n=args.images, image_size=tuple(args.size),
        transforms=DetectionPresetTrain("ssd"))
    ds_plain = SyntheticJpegDetection(
        args.corpus, n=args.images, image_size=tuple(args.size))

    kw = dict(batch_size=args.batch, image_size=tuple(args.out_size))
    for w in args.workers:
        measure(DetectionLoader(ds_aug, num_workers=w, **kw),
                args.images, f"python j={w}")

    from demonet_tpu.data import native
    if native.available():
        measure(DetectionLoader(ds_plain, native_decode=True,
                                native_threads=max(4, os.cpu_count() or 4),
                                **kw),
                args.images, "native")
    else:
        print("      native: libdemonet_imageio.so not built — skipped")


if __name__ == "__main__":
    main()
