"""Pallas TPU kernel for batched greedy NMS — the hot post-processing op.

This replaces torchvision's C++/CUDA `batched_nms` custom op (reference call
sites demonet/models/generalized_ssd.py:389, box_head.py:374) with a TPU
kernel. Profiling shows the XLA scan-based NMS dominates end-to-end inference
(>90% of batch-64 latency): it materializes a (P, K, K) IoU tensor in HBM and
walks it with a K-step sequential scan — pure HBM traffic.

Kernel design:
  * problems = (image x class) pairs, vectorized across the LANE dim (a chunk
    of problems per grid step); candidates live on the sublane dim so the
    suppression loop's dynamic index is a sublane offset (Mosaic allows
    arbitrary dynamic sublane offsets; lane offsets must be 128-aligned);
  * everything is VMEM-resident — IoU rows are computed on the fly per step
    and never materialized in HBM;
  * candidates arrive score-sorted (lax.top_k output), so valid entries are a
    PREFIX of each problem: the suppression loop runs only to the longest
    valid prefix in the chunk — with a trained model most classes have a
    handful of above-threshold candidates, so the loop is typically tens of
    steps, not K.

Exactness: identical keep set to ops.nms.nms_mask (greedy, score-descending)
on sorted inputs; tests cross-check against it (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, score_ref, keep_ref,
                supp_ref,
                *, iou_threshold: float, score_threshold: float, k: int):
    # All refs are (K, C): candidates on sublanes, problems on lanes.
    x1, y1, x2, y2 = x1_ref[:], y1_ref[:], x2_ref[:], y2_ref[:]
    scores = score_ref[:]
    c = x1.shape[1]

    valid = scores > score_threshold  # (K, C); a prefix along axis 0
    area = (x2 - x1) * (y2 - y1)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, c), 0)

    # Longest valid prefix in this chunk bounds the suppression loop.
    bound = jnp.max(jnp.sum(valid.astype(jnp.int32), axis=0))

    # Suppression state in VMEM scratch so the loop can dynamically index it.
    supp_ref[:] = jnp.logical_not(valid)

    def body(i, _):
        bx1 = x1_ref[pl.ds(i, 1), :]  # (1, C)
        by1 = y1_ref[pl.ds(i, 1), :]
        bx2 = x2_ref[pl.ds(i, 1), :]
        by2 = y2_ref[pl.ds(i, 1), :]
        barea = (bx2 - bx1) * (by2 - by1)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / jnp.maximum(area + barea - inter, 1e-9)

        kept_i = jnp.logical_not(supp_ref[pl.ds(i, 1), :])
        kept_i = jnp.logical_and(
            kept_i, score_ref[pl.ds(i, 1), :] > score_threshold)
        new_supp = kept_i & (iou > iou_threshold) & (row > i)
        supp_ref[:] = jnp.logical_or(supp_ref[:], new_supp)
        return 0

    jax.lax.fori_loop(0, bound, body, 0)
    keep_ref[:] = jnp.logical_and(jnp.logical_not(supp_ref[:]), valid)


def nms_keep_batch(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float,
    chunk: int = 512,
    interpret: bool = False,
    vmem_cap: int = 160_000,
) -> jnp.ndarray:
    """Greedy NMS keep mask over a batch of independent problems.

    Args:
      boxes: (P, K, 4) xyxy, score-sorted DESCENDING within each problem.
      scores: (P, K); entries <= score_threshold are padding.
      vmem_cap: max k_pad * chunk product (see below). The 160,000
        default is calibrated on the MANY-problem regime (thousands of
        lanes, multi-step grids). Callers in the few-problem regime
        (P <= chunk, single grid step — e.g. the fused per-image
        postprocess at P = batch) may pass the measured-safe 262,144:
        K=2048 x chunk=128 compiled and ran at P=64/128 on v5e
        (5.8 MB scoped VMEM; probed 2026-08-18).

    Returns (P, K) bool keep mask.
    """
    p, k, _ = boxes.shape
    k_pad = _round_up(max(k, 8), 8)
    # Scoped VMEM per grid step scales with k_pad * chunk (5 f32 input
    # blocks + bool out block + scratch), on top of the padded keep
    # output XLA may place in VMEM. k_pad * chunk = 204,800
    # (ssd300_vgg16: K=400 x 2,880 problems at chunk 512) measured 44 KB
    # OVER the 16 MB scoped limit on v5e; 155,648 (ssdlite320: K=304 x
    # 5,888) fits with headroom. Cap the product at `vmem_cap` — existing
    # verified configs keep their chunk, larger-K problem sets shrink it.
    if k_pad * chunk > vmem_cap:
        fit = (vmem_cap // k_pad) // 128 * 128  # lane-multiple chunks only
        if fit == 0:
            raise ValueError(
                f"NMS candidate width K={k} (padded {k_pad}) cannot meet "
                f"the k_pad*chunk <= {vmem_cap} scoped-VMEM cap at any "
                "lane-multiple chunk; split the candidate set or use the "
                "XLA NMS")
        chunk = min(chunk, fit)  # only ever shrink the caller's chunk
    p_pad = _round_up(max(p, chunk), chunk)

    neg = jnp.float32(min(score_threshold, -1e30))
    # (K, P) layout: candidates on sublanes, problems on lanes.
    scores_p = jnp.full((k_pad, p_pad), neg, jnp.float32)
    scores_p = scores_p.at[:k, :p].set(scores.astype(jnp.float32).T)
    coords = []
    for d in range(4):
        c = jnp.zeros((k_pad, p_pad), jnp.float32)
        coords.append(c.at[:k, :p].set(boxes[..., d].astype(jnp.float32).T))

    grid = (p_pad // chunk,)
    spec = pl.BlockSpec((k_pad, chunk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _nms_kernel, iou_threshold=float(iou_threshold),
        score_threshold=float(score_threshold), k=k_pad)
    keep = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((k_pad, p_pad), jnp.bool_),
        scratch_shapes=[pltpu.VMEM((k_pad, chunk), jnp.bool_)],
        interpret=interpret,
    )(*coords, scores_p)
    return keep[:k, :p].T
