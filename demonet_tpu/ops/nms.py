"""On-device non-maximum suppression with static shapes.

The reference dispatches to torchvision's C++/CUDA ``nms`` / ``batched_nms``
custom ops (demonet/models/generalized_ssd.py:389, demonet/models/box_head.py:374).
On TPU there is no dynamic-shape custom op: these kernels implement *exact
greedy NMS semantics* (same keep set, same score-descending keep order) over
fixed-size padded inputs, returning masks / padded index sets, so the whole
post-processing pipeline stays on-device and jit/vmap-compiles.

Algorithm: sort candidates by descending score, build the pairwise IoU matrix
once (MXU/VPU-friendly, O(N^2) elementwise), then resolve the sequential
greedy dependency with a ``lax.scan`` over rows — each step is O(N) vector
work, so the kernel is bandwidth-trivial for the N<=512 candidate counts SSD
post-processing uses.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from demonet_tpu.ops.boxes import box_iou

_NEG_INF = -1e30


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float = _NEG_INF,
) -> jnp.ndarray:
    """Greedy NMS keep-mask, original order.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,). Entries with ``score <= score_threshold`` are treated as
        padding: never kept, never suppress anything.
      iou_threshold: suppress j if IoU(i, j) > threshold for an earlier-kept i.

    Returns:
      (N,) bool keep mask in the *original* box order.
    """
    n = boxes.shape[0]
    valid = scores > score_threshold
    order = jnp.argsort(-jnp.where(valid, scores, _NEG_INF))
    b = jnp.take(boxes, order, axis=0)
    v = jnp.take(valid, order, axis=0)

    iou, _ = box_iou(b, b)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    # overlap[i, j] True when an earlier-kept i would suppress later j.
    overlap = (iou > iou_threshold) & (col > row)

    def step(suppressed, i):
        kept_i = jnp.logical_not(suppressed[i]) & v[i]
        suppressed = suppressed | (kept_i & overlap[i])
        return suppressed, None

    suppressed0 = jnp.logical_not(v)  # padding never kept
    suppressed, _ = jax.lax.scan(step, suppressed0, jnp.arange(n))
    keep_sorted = jnp.logical_not(suppressed) & v
    # Scatter back to original order.
    keep = jnp.zeros((n,), jnp.bool_).at[order].set(keep_sorted)
    return keep


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    score_threshold: float = _NEG_INF,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS returning top ``max_output`` kept indices by descending score.

    Returns (indices (max_output,), valid_mask (max_output,)). Padding indices
    are 0 with valid_mask False (use the mask, not the index values).
    """
    keep = nms_mask(boxes, scores, iou_threshold, score_threshold)
    kept_scores = jnp.where(keep, scores, _NEG_INF)
    top_scores, idx = jax.lax.top_k(kept_scores, max_output)
    valid = top_scores > _NEG_INF / 2
    return jnp.where(valid, idx, 0), valid


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    iou_threshold: float,
    max_output: int,
    score_threshold: float = _NEG_INF,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the coordinate-offset trick.

    Same semantics as torchvision ``batched_nms`` (used at reference
    generalized_ssd.py:389): boxes of different ``labels`` never suppress each
    other. Implemented by translating each class to a disjoint coordinate
    range, then running a single class-agnostic NMS.
    """
    max_coord = jnp.max(jnp.where(scores > score_threshold, jnp.max(boxes, axis=-1), 0.0))
    offsets = labels.astype(boxes.dtype)[:, None] * (max_coord + 1.0)
    return nms(boxes + offsets, scores, iou_threshold, max_output, score_threshold)
