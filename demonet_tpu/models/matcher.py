"""Anchor-to-ground-truth matching, fully vectorized (vmap over images).

Capability parity with reference demonet/models/_utils.py:
  * `match`      — generic two-threshold Matcher with BELOW_LOW_QUALITY=-1,
                   BETWEEN_THRESHOLDS=-2 and optional low-quality restore
                   (_utils.py:227-345).
  * `ssd_match`  — single-threshold SSDMatcher incl. the force-best-anchor-
                   per-gt assignment (_utils.py:348-362).
  * `balanced_sampler` — BalancedPositiveNegativeSampler (_utils.py:11-77).

TPU-first: ragged ground truth arrives as fixed-size padded arrays with a
validity mask; padded rows never match (their IoU row is masked to -1) and
never receive a forced assignment (their scatter index is dropped OOB).
The reference instead branches per image on `numel() == 0`
(generalized_ssd.py:330-337) — host control flow that can't live under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BELOW_LOW_QUALITY = -1
BETWEEN_THRESHOLDS = -2


def match(
    quality: jnp.ndarray,
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool = False,
    gt_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Generic matcher over a (G, A) quality matrix -> (A,) gt indices.

    Anchors with max quality < low_threshold get -1, in [low, high) get -2.
    With ``allow_low_quality_matches``, every gt's best anchors (ties
    included) keep their pre-threshold match (_utils.py:316-345).
    """
    if gt_valid is not None:
        quality = jnp.where(gt_valid[:, None], quality, -1.0)
    matched_vals = jnp.max(quality, axis=0)
    all_matches = jnp.argmax(quality, axis=0).astype(jnp.int32)
    matches = jnp.where(matched_vals >= high_threshold, all_matches, BETWEEN_THRESHOLDS)
    matches = jnp.where(matched_vals < low_threshold, BELOW_LOW_QUALITY, matches)

    if allow_low_quality_matches:
        highest_per_gt = jnp.max(quality, axis=1, keepdims=True)  # (G, 1)
        is_best = quality == highest_per_gt
        if gt_valid is not None:
            is_best = is_best & gt_valid[:, None]
        restore = jnp.any(is_best, axis=0)
        matches = jnp.where(restore, all_matches, matches)
    return matches


def ssd_match(
    iou: jnp.ndarray,
    iou_thresh: float = 0.5,
    gt_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SSD matcher: threshold + force best anchor per gt (_utils.py:348-362).

    Args:
      iou: (G, A) IoU of (possibly padded) gt boxes vs anchors.
      iou_thresh: anchors with best IoU below this become background (-1).
      gt_valid: (G,) bool mask of real gt rows; None = all valid.

    Returns:
      (A,) int32, gt index per anchor or -1 for background.

    Tie-break divergence note: when several gts share the same best anchor
    the reference's sequential overwrite keeps the *last* gt
    (_utils.py:357-360); this scatter keeps an unspecified one. The event
    requires two gts whose argmax anchors coincide — measure-zero for real
    data and irrelevant to the loss magnitude.
    """
    g, a = iou.shape
    masked = iou if gt_valid is None else jnp.where(gt_valid[:, None], iou, -1.0)
    matched_vals = jnp.max(masked, axis=0)
    matches = jnp.argmax(masked, axis=0).astype(jnp.int32)
    matches = jnp.where(matched_vals >= iou_thresh, matches, BELOW_LOW_QUALITY)

    # Force-assign each (valid) gt to its best anchor.
    best_anchor = jnp.argmax(masked, axis=1)  # (G,)
    if gt_valid is not None:
        best_anchor = jnp.where(gt_valid, best_anchor, a)  # OOB => dropped
    matches = matches.at[best_anchor].set(
        jnp.arange(g, dtype=jnp.int32), mode="drop")
    return matches


def balanced_sampler(
    rng: jax.Array,
    labels: jnp.ndarray,
    batch_size_per_image: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random balanced positive/negative sampling masks (_utils.py:11-77).

    Args:
      labels: (A,) with 1 = positive, 0 = negative, -1 = ignore.

    Returns (pos_mask, neg_mask) — fixed-shape boolean masks whose totals
    follow the reference's num_pos/num_neg accounting.
    """
    a = labels.shape[0]
    pos = labels >= 1
    neg = labels == 0
    num_pos_cap = int(batch_size_per_image * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(pos), num_pos_cap)
    num_neg = jnp.minimum(jnp.sum(neg), batch_size_per_image - num_pos)

    k_pos, k_neg = jax.random.split(rng)

    def pick(key, mask, k):
        scores = jnp.where(mask, jax.random.uniform(key, (a,)), -1.0)
        order = jnp.argsort(-scores)
        rank = jnp.zeros((a,), jnp.int32).at[order].set(jnp.arange(a, dtype=jnp.int32))
        return mask & (rank < k)

    return pick(k_pos, pos, num_pos), pick(k_neg, neg, num_neg)
