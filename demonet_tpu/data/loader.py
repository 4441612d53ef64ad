"""Batch loader: host pipeline feeding fixed-shape padded device batches.

The reference pipeline is DataLoader + tuple(zip(*batch)) list-collation +
GroupedBatchSampler (train.py:123-144, util/misc.py:235). On TPU ragged
batches are an anti-pattern: every batch here is a dense fixed-shape dict

    images          (B, H, W, 3) float32 in [0, 1], resized to the model size
    gt_boxes        (B, MAX_GT, 4) xyxy in resized coords, zero-padded
    gt_labels       (B, MAX_GT) int32, zero-padded
    gt_valid        (B, MAX_GT) bool
    image_ids       (B,) int64
    original_sizes  (B, 2) int32 (h, w)
    batch_valid     (B,) bool — False for the tail padding of the last batch

so the jitted train/eval steps never recompile. Aspect-ratio grouping
(reference group_by_aspect_ratio.py) is unnecessary: with fixed-size resize
there's no padding waste to optimize away.

A background thread prefetches/assembles the next batches while the device
runs the current step (the reference's num_workers loader processes,
train.py:137-144).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Tuple

import numpy as np


class DetectionLoader:
    """Iterable over fixed-shape batches of a detection dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        image_size: Tuple[int, int],
        shuffle: bool = False,
        max_gt: int = 100,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        num_shards: int = 1,
        shard_index: int = 0,
        pad_last_batch: bool = True,
        native_decode: bool = False,
        native_threads: int = 4,
        batch_sampler=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.image_size = image_size
        self.shuffle = shuffle
        self.max_gt = max_gt
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.pad_last_batch = pad_last_batch
        # optional index-batch sampler (e.g. GroupedBatchSampler) replacing
        # the default shuffled/sharded index stream (reference
        # train.py:130-135 aspect-ratio grouping)
        self.batch_sampler = batch_sampler
        self.epoch = 0
        # Native C++ decode+resize fast path (cpp/imageio.cc): bypasses
        # Python-side augmentations, so it's an eval/serving path.
        self.native_decode = False
        self.native_threads = native_threads
        if native_decode:
            from demonet_tpu.data import native

            if not hasattr(dataset, "raw_item"):
                raise ValueError("dataset lacks raw_item(); cannot use "
                                 "native_decode")
            if not native.available():
                raise RuntimeError(
                    "native_decode requested but libdemonet_imageio.so is "
                    "not built (cmake -S cpp -B cpp/build && "
                    "cmake --build cpp/build)")
            self.native_decode = True

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle per epoch (reference DistributedSampler.set_epoch,
        train.py:188)."""
        self.epoch = epoch
        if self.batch_sampler is not None and hasattr(
                self.batch_sampler, "set_epoch"):
            self.batch_sampler.set_epoch(epoch)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)
        # contiguous shard per process (equal sizes via padding, like
        # DistributedSampler's wrap-around)
        if self.num_shards > 1:
            per = -(-n // self.num_shards)
            padded = np.concatenate([idx, idx[: per * self.num_shards - n]])
            idx = padded[self.shard_index::self.num_shards]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _load_one(self, ds_idx: int, rng: np.random.Generator):
        import cv2

        img, target = self.dataset[int(ds_idx)]
        h, w = img.shape[:2]
        nh, nw = self.image_size
        if (h, w) != (nh, nw):
            img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
            if len(target.get("boxes", ())):
                target = dict(target, boxes=target["boxes"] * np.asarray(
                    [nw / w, nh / h, nw / w, nh / h], np.float32))
        if img.dtype != np.float32:
            img = img.astype(np.float32) / 255.0
        return img, target, (h, w)

    def _assemble_native(self, ds_indices: np.ndarray) -> Dict[str, np.ndarray]:
        """Batch decode+resize in C++ (one call), targets from metadata."""
        from demonet_tpu.data import native

        b = self.batch_size
        nh, nw = self.image_size
        g = self.max_gt
        blobs, targets = [], []
        for ds_idx in ds_indices:
            blob, target = self.dataset.raw_item(int(ds_idx))
            blobs.append(blob)
            targets.append(target)
        images, hw = native.decode_jpeg_batch(
            blobs, nh, nw, self.native_threads)

        out = {
            "images": np.zeros((b, nh, nw, 3), np.float32),
            "gt_boxes": np.zeros((b, g, 4), np.float32),
            "gt_labels": np.zeros((b, g), np.int32),
            "gt_valid": np.zeros((b, g), bool),
            "image_ids": np.zeros((b,), np.int64),
            "original_sizes": np.zeros((b, 2), np.int32),
            "batch_valid": np.zeros((b,), bool),
        }
        n = len(ds_indices)
        out["images"][:n] = images
        out["original_sizes"][:n] = hw
        for i, target in enumerate(targets):
            h, w = hw[i]
            boxes = np.asarray(target.get("boxes", np.zeros((0, 4))))
            if len(boxes):
                boxes = boxes * np.asarray(
                    [nw / w, nh / h, nw / w, nh / h], np.float32)
            labels = np.asarray(target.get("labels", np.zeros((0,))))
            k = min(len(boxes), g)
            if k:
                out["gt_boxes"][i, :k] = boxes[:k]
                out["gt_labels"][i, :k] = labels[:k]
                out["gt_valid"][i, :k] = True
            out["image_ids"][i] = target.get("image_id", int(ds_indices[i]))
            out["batch_valid"][i] = True
        return out

    def _assemble(self, ds_indices: np.ndarray,
                  rng: np.random.Generator) -> Dict[str, np.ndarray]:
        if self.native_decode:
            return self._assemble_native(ds_indices)
        b = self.batch_size
        nh, nw = self.image_size
        g = self.max_gt
        out = {
            "images": np.zeros((b, nh, nw, 3), np.float32),
            "gt_boxes": np.zeros((b, g, 4), np.float32),
            "gt_labels": np.zeros((b, g), np.int32),
            "gt_valid": np.zeros((b, g), bool),
            "image_ids": np.zeros((b,), np.int64),
            "original_sizes": np.zeros((b, 2), np.int32),
            "batch_valid": np.zeros((b,), bool),
        }
        for i, ds_idx in enumerate(ds_indices):
            img, target, (h, w) = self._load_one(ds_idx, rng)
            out["images"][i] = img
            boxes = np.asarray(target.get("boxes", np.zeros((0, 4))))
            labels = np.asarray(target.get("labels", np.zeros((0,))))
            k = min(len(boxes), g)
            if k:
                out["gt_boxes"][i, :k] = boxes[:k]
                out["gt_labels"][i, :k] = labels[:k]
                out["gt_valid"][i, :k] = True
            out["image_ids"][i] = target.get("image_id", int(ds_idx))
            out["original_sizes"][i] = (h, w)
            out["batch_valid"][i] = True
        return out

    def _batch_indices(self) -> Iterator[np.ndarray]:
        if self.batch_sampler is not None:
            for chunk in self.batch_sampler:
                yield np.asarray(chunk)
            return
        idx = self._indices()
        n = len(idx)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for s in range(0, stop, self.batch_size):
            chunk = idx[s:s + self.batch_size]
            if len(chunk) < self.batch_size and not self.pad_last_batch:
                continue
            yield chunk

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(
            (self.seed + self.epoch) * 9973 + self.shard_index)
        if self.prefetch <= 0:
            for chunk in self._batch_indices():
                yield self._assemble(chunk, rng)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for chunk in self._batch_indices():
                    q.put(self._assemble(chunk, rng))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
