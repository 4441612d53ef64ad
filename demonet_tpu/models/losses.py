"""MultiBox loss: smooth-L1 box regression + cross-entropy with 3:1 hard
negative mining — dense, batched, jit-compiled.

Semantics parity with reference `SSD.compute_loss`
(demonet/models/generalized_ssd.py:210-269):
  * regression: smooth-L1 (beta=1), summed over foreground anchors, divided
    by max(1, total foreground across the batch);
  * classification: per-anchor CE; negatives ranked per image by descending
    loss with positives excluded via -inf; keep the top
    neg_to_pos_ratio * num_pos_i negatives (the reference's sort-trick at
    :255-263 is exactly a double-argsort rank here); (fg CE + selected bg CE)
    divided by the same N.

The reference loops over images on the host (:219-242); here everything is a
dense (B, A) computation so XLA fuses the whole loss into the backward pass.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from demonet_tpu.models.matcher import ssd_match
from demonet_tpu.ops.boxes import box_iou, encode_boxes


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """torch F.smooth_l1_loss semantics, elementwise."""
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def match_batch(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    iou_thresh: float = 0.5,
) -> jnp.ndarray:
    """vmapped SSD matching: (A, 4), (B, G, 4), (B, G) -> (B, A) gt idx or -1."""

    def one(gtb, gtv):
        iou, _ = box_iou(gtb, anchors)
        return ssd_match(iou, iou_thresh, gtv)

    return jax.vmap(one)(gt_boxes, gt_valid)


def multibox_loss(
    cls_logits: jnp.ndarray,
    bbox_regression: jnp.ndarray,
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    matched_idxs: jnp.ndarray | None = None,
    iou_thresh: float = 0.5,
    neg_to_pos_ratio: float = 3.0,
    box_coder_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0),
) -> Dict[str, jnp.ndarray]:
    """The SSD MultiBox loss over a padded batch.

    Args:
      cls_logits: (B, A, C) — class 0 is background.
      bbox_regression: (B, A, 4) predicted deltas.
      anchors: (A, 4) xyxy (shared across the batch — static input size).
      gt_boxes: (B, G, 4) xyxy, zero-padded.
      gt_labels: (B, G) int, zero-padded.
      gt_valid: (B, G) bool.
      matched_idxs: optional precomputed (B, A) matching.

    Returns dict with 'bbox_regression' and 'classification' scalars
    (the reference's loss dict keys, generalized_ssd.py:266-269).
    """
    if matched_idxs is None:
        matched_idxs = match_batch(anchors, gt_boxes, gt_valid, iou_thresh)

    b, a, num_classes = cls_logits.shape
    g = gt_boxes.shape[1]
    fg = matched_idxs >= 0  # (B, A)
    num_fg_per_img = jnp.sum(fg, axis=1)  # (B,)
    n = jnp.maximum(1, jnp.sum(num_fg_per_img)).astype(cls_logits.dtype)

    # Per-anchor gathers of matched gt rows are pathological row-gathers on
    # TPU; a one-hot batched matmul does the same selection on the MXU.
    safe_idx = jnp.clip(matched_idxs, 0, g - 1)
    select = jax.nn.one_hot(safe_idx, g, dtype=cls_logits.dtype)  # (B, A, G)

    # ---- regression (generalized_ssd.py:226-235) ----
    matched_gt = jnp.einsum(
        "bag,bgc->bac", select, gt_boxes.astype(cls_logits.dtype),
        preferred_element_type=jnp.float32)  # (B, A, 4)
    target_reg = encode_boxes(matched_gt, anchors[None], box_coder_weights)
    reg_l = jnp.sum(smooth_l1(bbox_regression - target_reg), axis=-1)  # (B, A)
    bbox_loss = jnp.sum(reg_l * fg) / n

    # ---- classification targets (generalized_ssd.py:237-242) ----
    matched_labels = jnp.einsum(
        "bag,bg->ba", select, gt_labels.astype(jnp.float32),
        preferred_element_type=jnp.float32).astype(gt_labels.dtype)
    cls_targets = jnp.where(fg, matched_labels, 0)

    # CE without per-anchor label gathers: one-hot contraction + logsumexp.
    logz = jax.nn.logsumexp(cls_logits, axis=-1)  # (B, A)
    label_onehot = jax.nn.one_hot(cls_targets, num_classes,
                                  dtype=cls_logits.dtype)
    label_logit = jnp.einsum("bac,bac->ba", cls_logits, label_onehot)
    ce = logz - label_logit  # (B, A)

    # ---- hard negative mining (generalized_ssd.py:255-263) ----
    num_neg = (neg_to_pos_ratio * num_fg_per_img)[:, None]  # (B, 1)
    neg_loss = jnp.where(fg, -jnp.inf, ce)
    order = jnp.argsort(-neg_loss, axis=1)
    # rank[i, order[i, k]] = k: the inverse permutation is itself an argsort
    # (sort-based — avoids a (B, A) scatter, reference's idx.sort(1)[1] trick)
    rank = jnp.argsort(order, axis=1).astype(jnp.int32)
    bg = rank < num_neg

    cls_loss = (jnp.sum(ce * fg) + jnp.sum(ce * bg)) / n

    return {"bbox_regression": bbox_loss, "classification": cls_loss}
