"""Box geometry ops — pure jnp, fully batched, jit/vmap-friendly.

Capability parity with the reference's box math:
  * cxcywh <-> xyxy conversions    (reference demonet/util/box_ops.py:9-33)
  * IoU / generalized IoU          (reference demonet/util/box_ops.py:37-74)
  * SSD delta encode / decode      (reference demonet/models/_utils.py:81-224)
  * clip-to-image, small-box mask  (reference uses torchvision C++ ops,
                                    demonet/models/generalized_ssd.py:363,
                                    demonet/models/box_head.py:370)
  * masks_to_boxes                 (reference demonet/util/box_ops.py:77-101)

All functions accept arbitrary leading batch dimensions; boxes live in the
last axis as ``(..., 4)``.  Everything is branch-free and static-shape so XLA
fuses it into surrounding compute.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

# Matches the reference's decode clamp: log(1000/16)
# (demonet/models/_utils.py:135 `bbox_xform_clip=math.log(1000. / 16)`).
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)

# SSD box-coder weights (demonet/models/ssd_mobilenetv3.py:187,
# generalized_ssd.py:168 `BoxCoder(weights=(10., 10., 5., 5.))`).
DEFAULT_BOX_CODER_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; shape (..., N)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def _pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise IoU of xyxy boxes: (..., M, 4) x (..., N, 4) -> ((..., M, N), union).

    Returns (iou, union) like the reference (demonet/util/box_ops.py:37-50).
    Degenerate/padded boxes produce 0 IoU (guarded divide).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    inter = _pairwise_intersection(boxes1, boxes2)
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/), reference box_ops.py:53-74."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    enclosing = wh[..., 0] * wh[..., 1]
    return iou - (enclosing - union) / jnp.maximum(enclosing, 1e-9)


def encode_boxes(
    reference_boxes: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: Tuple[float, float, float, float] = DEFAULT_BOX_CODER_WEIGHTS,
) -> jnp.ndarray:
    """Encode gt boxes as (dx, dy, dw, dh) regression targets w.r.t. anchors.

    Semantics of the reference encoder (demonet/models/_utils.py:81-126):
      dx = wx * (gt_cx - a_cx) / a_w, dw = ww * log(gt_w / a_w), etc.
    Both inputs are xyxy, shape (..., N, 4). Padded gt rows are harmless as
    long as the caller masks the resulting loss (log is guarded).
    """
    wx, wy, ww, wh = weights
    a = box_xyxy_to_cxcywh(anchors)
    g = box_xyxy_to_cxcywh(reference_boxes)
    a_wh = jnp.maximum(a[..., 2:], 1e-8)
    g_wh = jnp.maximum(g[..., 2:], 1e-8)
    txy = (g[..., :2] - a[..., :2]) / a_wh * jnp.asarray([wx, wy], a.dtype)
    twh = jnp.log(g_wh / a_wh) * jnp.asarray([ww, wh], a.dtype)
    return jnp.concatenate([txy, twh], axis=-1)


def decode_boxes(
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: Tuple[float, float, float, float] = DEFAULT_BOX_CODER_WEIGHTS,
    bbox_xform_clip: float = BBOX_XFORM_CLIP,
) -> jnp.ndarray:
    """Apply predicted (dx, dy, dw, dh) deltas to xyxy anchors -> xyxy boxes.

    Mirrors the reference decoder incl. the exp clamp
    (demonet/models/_utils.py:187-224).
    """
    wx, wy, ww, wh = weights
    a = box_xyxy_to_cxcywh(anchors)
    dxy = deltas[..., :2] / jnp.asarray([wx, wy], deltas.dtype)
    dwh = deltas[..., 2:] / jnp.asarray([ww, wh], deltas.dtype)
    dwh = jnp.minimum(dwh, bbox_xform_clip)
    cxy = dxy * a[..., 2:] + a[..., :2]
    pwh = jnp.exp(dwh) * a[..., 2:]
    return box_cxcywh_to_xyxy(jnp.concatenate([cxy, pwh], axis=-1))


def clip_boxes_to_image(boxes: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Clip xyxy boxes to [0, w] x [0, h]. ``size`` is (height, width)."""
    h, w = size
    limits = jnp.asarray([w, h, w, h], boxes.dtype)
    return jnp.clip(boxes, 0.0, limits)


def remove_small_boxes_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Boolean mask of boxes with both sides >= min_size.

    Fixed-shape analogue of torchvision ``remove_small_boxes``
    (reference demonet/models/box_head.py:370) — returns a mask instead of a
    dynamic index set so it stays on-device.
    """
    wh = boxes[..., 2:] - boxes[..., :2]
    return (wh[..., 0] >= min_size) & (wh[..., 1] >= min_size)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding xyxy boxes of binary masks (..., N, H, W) -> (..., N, 4).

    Reference demonet/util/box_ops.py:77-101; empty masks yield zeros.
    """
    h, w = masks.shape[-2:]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    m = masks.astype(jnp.float32)
    any_mask = jnp.any(masks, axis=(-1, -2))
    big = jnp.float32(1e8)
    x_proj = jnp.max(m, axis=-2)  # (..., N, W)
    y_proj = jnp.max(m, axis=-1)  # (..., N, H)
    x_min = jnp.min(jnp.where(x_proj > 0, xs, big), axis=-1)
    x_max = jnp.max(jnp.where(x_proj > 0, xs, -big), axis=-1)
    y_min = jnp.min(jnp.where(y_proj > 0, ys, big), axis=-1)
    y_max = jnp.max(jnp.where(y_proj > 0, ys, -big), axis=-1)
    boxes = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(any_mask[..., None], boxes, 0.0)
