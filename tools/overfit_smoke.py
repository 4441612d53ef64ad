"""End-to-end learning acceptance test: overfit a tiny synthetic detection
set and verify AP50 rises toward 1.0.

The reference's accuracy checking is manual --test-only runs with pretrained
checkpoints (SURVEY.md §4 "eval-as-test"); with no network egress for
checkpoints, this script proves the full loop — loader -> jitted train step
(matching + MultiBox loss + SGD + BN stats) -> jitted predict (decode + NMS)
-> COCO evaluator — actually learns.

Usage: python tools/overfit_smoke.py [--steps 300] [--size 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# repo root importability when run as `python tools/overfit_smoke.py`
# (do NOT use PYTHONPATH: it interferes with jax plugin discovery here)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class ShapesDataset:
    """Colored rectangles on noise; 3 foreground classes."""

    def __init__(self, n=32, size=128, seed=0):
        rng = np.random.RandomState(seed)
        self.samples = []
        for i in range(n):
            img = (rng.rand(size, size, 3) * 40).astype(np.uint8)
            num = rng.randint(1, 3)
            boxes, labels = [], []
            for _ in range(num):
                w, h = rng.randint(size // 5, size // 2, 2)
                x1 = rng.randint(0, size - w)
                y1 = rng.randint(0, size - h)
                label = rng.randint(1, 4)
                color = {1: [230, 40, 40], 2: [40, 230, 40], 3: [40, 40, 230]}[label]
                img[y1:y1 + h, x1:x1 + w] = color
                boxes.append([x1, y1, x1 + w, y1 + h])
                labels.append(label)
            self.samples.append((img, {
                "boxes": np.asarray(boxes, np.float32),
                "labels": np.asarray(labels, np.int64),
                "image_id": i, "orig_size": (size, size)}))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        img, t = self.samples[idx]
        return img.astype(np.float32) / 255.0, t

    def ground_truth_for_eval(self):
        return [{"image_id": t["image_id"], "boxes": t["boxes"],
                 "labels": t["labels"]} for _, t in self.samples]


def main(args) -> int:
    import jax

    from demonet_tpu.data.coco_eval import CocoEvaluator
    from demonet_tpu.data.loader import DetectionLoader
    from demonet_tpu.engine import (
        create_train_state, evaluate, make_lr_schedule, make_optimizer,
        make_predict_step, make_train_step)
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large

    size = (args.size, args.size)
    det = ssdlite320_mobilenet_v3_large(
        num_classes=4, size=size, score_thresh=0.2,
        detections_per_img=20, topk_candidates=50)
    ds = ShapesDataset(n=args.num_images, size=args.size)
    loader = DetectionLoader(ds, batch_size=args.batch_size, image_size=size,
                             shuffle=True, max_gt=8, prefetch=0)

    tx = make_optimizer(
        make_lr_schedule(args.lr, steps_per_epoch=len(loader),
                         milestones=[10**9], warmup_iters=50),
        momentum=0.9, weight_decay=1e-4)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    step = make_train_step(det)

    t0 = time.time()
    it = 0
    losses = []
    while it < args.steps:
        loader.set_epoch(it)
        for batch in loader:
            batch = {k: v for k, v in batch.items()
                     if k in ("images", "gt_boxes", "gt_labels", "gt_valid")}
            state, metrics = step(state, batch)
            it += 1
            if it % 50 == 0:
                loss = float(metrics["loss"])
                losses.append(loss)
                print(f"step {it}: loss {loss:.3f} "
                      f"({(time.time() - t0) / it * 1000:.0f} ms/step)")
            if it >= args.steps:
                break

    predict = make_predict_step(det)
    eval_loader = DetectionLoader(ds, batch_size=args.batch_size,
                                  image_size=size, prefetch=0)
    ev = evaluate(predict, state, eval_loader,
                  CocoEvaluator(ds.ground_truth_for_eval()))
    ap50 = ev.stats[1]
    print(f"\nAP50 after {args.steps} steps: {ap50:.3f}")
    ok = ap50 >= args.min_ap50
    print("PASS" if ok else "FAIL", f"(threshold {args.min_ap50})")
    return 0 if ok else 1


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--num-images", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--min-ap50", type=float, default=0.5)
    sys.exit(main(p.parse_args()))
