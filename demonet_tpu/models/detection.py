"""The SSD meta-architecture, TPU-style.

Where the reference's `SSD` nn.Module mode-switches between loss and
detections inside one `forward` (demonet/models/generalized_ssd.py:271-349),
here the pieces are orthogonal pure functions around one flax module:

  * `SSD` (flax module)      — extractor + head => {'cls_logits',
                               'bbox_regression'} dense outputs.
  * `preprocess`             — normalize + resize to the fixed input size
                               (reference transform.py:89-226).
  * `loss_fn` via losses.multibox_loss — training path
                               (generalized_ssd.py:210-269, :326-339).
  * `postprocess_detections` — decode, clip, per-class score filter + top-k,
                               class-wise NMS, cap at detections_per_img,
                               rescale to original sizes
                               (generalized_ssd.py:351-397, transform.py:228-247).

All post-processing is fixed-shape and on-device: detections come back as
padded (B, detections_per_img) arrays with a validity mask instead of the
reference's per-image Python lists.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from demonet_tpu.ops.boxes import clip_boxes_to_image, decode_boxes
from demonet_tpu.ops.nms import nms_mask

_NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    """Static detector hyper-parameters (reference generalized_ssd.py:154-197)."""

    size: Tuple[int, int]  # (H, W) fixed network input
    num_classes: int
    image_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    image_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    score_thresh: float = 0.01
    nms_thresh: float = 0.45
    detections_per_img: int = 200
    iou_thresh: float = 0.5
    topk_candidates: int = 400
    positive_fraction: float = 0.25
    box_coder_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)

    @property
    def neg_to_pos_ratio(self) -> float:
        # generalized_ssd.py:197
        return (1.0 - self.positive_fraction) / self.positive_fraction


class SSD(nn.Module):
    """extractor(images) -> multi-scale maps -> head -> dense predictions.

    Output: {'cls_logits': (B, A, C), 'bbox_regression': (B, A, 4)} where A is
    the total anchor count (static). The anchor array itself is a host-side
    constant (models/anchors.py) — it is NOT part of the module.
    """

    extractor: nn.Module
    head: nn.Module

    def __call__(self, images: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        features = self.extractor(images, train=train)
        return self.head(features, train=train)


def preprocess(
    images: jnp.ndarray,
    config: SSDConfig,
    resize: bool = True,
) -> jnp.ndarray:
    """Normalize (and optionally resize) a (B, H, W, 3) float [0,1] batch.

    Matches reference GeneralizedRCNNTransform.normalize/resize
    (transform.py:129-173) with fixed_size semantics: bilinear,
    half-pixel centers (= torch align_corners=False).

    uint8 input is accepted and scaled to [0,1] on device first — the
    host→device transfer then carries 1/4 the bytes (loader
    image_dtype="uint8"); the reference always ships float tensors.
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    mean = jnp.asarray(config.image_mean, images.dtype)
    std = jnp.asarray(config.image_std, images.dtype)
    x = (images - mean) / std
    if resize and x.shape[1:3] != tuple(config.size):
        b, _, _, c = x.shape
        # antialias=False: torch F.interpolate(mode='bilinear') does not
        # low-pass filter when downscaling, and neither does the host
        # cv2.INTER_LINEAR path — jax's antialias default would diverge
        # from both by up to ~0.23 per pixel on downscales.
        x = jax.image.resize(
            x, (b, config.size[0], config.size[1], c), method="bilinear",
            antialias=False)
    return x


def _nms_keep(cand_boxes: jnp.ndarray, cand_scores: jnp.ndarray,
              config: SSDConfig, nms_impl: str,
              chunk: int = 512, vmem_cap: int = 160_000) -> jnp.ndarray:
    """Keep mask for (P, K) score-sorted candidate sets.

    'pallas' = the TPU kernel (ops/nms_pallas.py); 'xla' = vmapped scan
    (ops/nms.py) for CPU/debug; 'auto' picks by backend. `chunk` =
    problems per kernel grid step (VMEM scales with K * chunk — the
    fused path's K=2048 problems use a smaller chunk and the raised
    few-problem `vmem_cap`, see nms_keep_batch).
    """
    if nms_impl == "auto":
        nms_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if nms_impl == "pallas":
        from demonet_tpu.ops.nms_pallas import nms_keep_batch

        return nms_keep_batch(
            cand_boxes, cand_scores, config.nms_thresh, _NEG_INF / 2,
            chunk=chunk, vmem_cap=vmem_cap)
    per_problem = functools.partial(
        nms_mask, iou_threshold=config.nms_thresh, score_threshold=_NEG_INF / 2)
    return jax.vmap(per_problem)(cand_boxes, cand_scores)


def _gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                 gather_impl: str) -> jnp.ndarray:
    """out[b, r] = table[b, idx[b, r]] — 'pallas' = exact one-hot-matmul
    kernel (ops/gather_pallas.py, bit-identical, ~2.5x faster on TPU than
    XLA's gather when the gather expands); 'xla' = flat row-gather.

    'auto' picks pallas when the gather is expanding or near-expanding
    (2R >= N): the kernel's cost rides the R-wide one-hot matmuls, so
    for few-rows-from-a-big-table (R << N, e.g. the final top-300
    gather, R/N ~ 0.1) XLA's scalar gather wins (measured 2.9 ms vs
    3.7 ms), while at R/N >= ~0.6 pallas wins on both measured points:
    the expanding candidate gather (5.9 ms XLA vs 2.3 ms pallas,
    tools/check_gather_tpu.py) and the fused-path tier-2048 candidate
    gather (R=2048, N=3234: 3.8 ms of the b128 serving step via XLA —
    2.67 ms SMEM index fusion + 1.14 ms row gather, round-5 trace —
    vs MXU one-hot work). Either impl returns bit-identical rows, so
    the crossover is pure performance, not semantics.
    'auto-tpu' / 'auto-cpu' keep the expanding heuristic but pin the
    platform half — for jax.export, where the TARGET platform (not the
    exporting host's backend) must decide kernel availability.
    """
    if gather_impl in ("auto", "auto-tpu", "auto-cpu"):
        if gather_impl == "auto":
            on_tpu = jax.default_backend() == "tpu"
        else:
            on_tpu = gather_impl == "auto-tpu"
        expanding = 2 * idx.shape[1] >= table.shape[1]
        gather_impl = "pallas" if (on_tpu and expanding) else "xla"
    if gather_impl == "pallas":
        from demonet_tpu.ops.gather_pallas import gather_rows_batch

        return gather_rows_batch(table, idx)
    b, n, d = table.shape
    flat = table.reshape(b * n, d)
    gi = (jnp.arange(b, dtype=idx.dtype)[:, None] * n + idx).reshape(-1)
    return jnp.take(flat, gi, axis=0).reshape(b, idx.shape[1], d)


def postprocess_detections(
    cls_logits: jnp.ndarray,
    bbox_regression: jnp.ndarray,
    anchors: jnp.ndarray,
    config: SSDConfig,
    original_sizes: Optional[jnp.ndarray] = None,
    nms_impl: str = "auto",
    topk_impl: str = "exact",
    gather_impl: str = "auto",
    impl: str = "reference",
) -> Dict[str, jnp.ndarray]:
    """Batched decode + class-wise NMS (+ rescale to original image sizes).

    Exactly the reference pipeline (generalized_ssd.py:351-397): softmax,
    decode, clip; per foreground class, score-threshold filter + top
    `topk_candidates`; class-wise NMS (classes never suppress each other);
    global top `detections_per_img` by score. All (image x class) candidate
    sets are flattened into one batched NMS kernel invocation.

    Args:
      cls_logits: (B, A, C); bbox_regression: (B, A, 4); anchors: (A, 4).
      original_sizes: optional (B, 2) int (h, w) per image; when given, boxes
        are rescaled from network-input coordinates to the original frame
        (reference transform.postprocess/resize_boxes, transform.py:228-292).

    Returns {'boxes': (B, D, 4), 'scores': (B, D), 'labels': (B, D) int32,
             'valid': (B, D) bool}.

    impl="fused" routes through the trained-model fast path
    (_postprocess_fused below) with an exact fallback to this pipeline.
    """
    scores = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    boxes = decode_boxes(
        bbox_regression.astype(jnp.float32), anchors[None],
        config.box_coder_weights)
    boxes = clip_boxes_to_image(boxes, config.size)
    if impl == "fused":
        return _postprocess_fused(
            scores, boxes, config, original_sizes, nms_impl, gather_impl)
    return _postprocess_reference_core(
        scores, boxes, config, original_sizes, nms_impl, topk_impl,
        gather_impl)


def _postprocess_reference_core(
    scores: jnp.ndarray,
    boxes: jnp.ndarray,
    config: SSDConfig,
    original_sizes: Optional[jnp.ndarray],
    nms_impl: str,
    topk_impl: str,
    gather_impl: str,
) -> Dict[str, jnp.ndarray]:
    """The reference pipeline AFTER softmax/decode/clip.

    Split out so the fused path's fallback branch can consume the SAME
    hoisted softmax scores and decoded boxes as the standalone program:
    everything in here is gathers, sorts and comparisons, which are
    bitwise-deterministic given identical inputs — whereas float math
    (softmax, decode) recompiled INSIDE a `lax.switch` branch fused
    differently and once produced a 1-ulp score diff that swapped two
    near-tied ranks (tools/diag_fused_mismatch.py, round 3).
    """
    b, a, c = scores.shape

    k = min(config.topk_candidates, a)
    fg_scores = jnp.swapaxes(scores[..., 1:], 1, 2)  # (B, C-1, A)
    if topk_impl == "approx":
        # opt-in serving mode: TPU PartialReduce top-k (not bit-exact
        # reference parity; see DESIGN.md)
        top_sc, top_idx = jax.lax.approx_max_k(fg_scores, k)
    elif topk_impl in ("sparse", "sparse_pallas"):
        # chunk-skipping top-k (ops/topk_pallas.py): exact semantics —
        # above-threshold entries bit-match lax.top_k, the rest are -inf
        # padding this very pipeline would assign anyway; falls back to
        # lax.top_k when candidates are dense (random weights). The
        # serving win on trained models: most (image, class) rows have no
        # above-threshold anchors at all. "sparse" = the fast pure-XLA
        # formulation; "sparse_pallas" = the measured-slower kernel.
        from demonet_tpu.ops.topk_pallas import topk_sparse, topk_sparse_xla

        fn = topk_sparse_xla if topk_impl == "sparse" else topk_sparse
        slots = max(8, -(-k // 128))
        top_sc, top_idx = fn(fg_scores, k, config.score_thresh, slots=slots)
    else:
        top_sc, top_idx = jax.lax.top_k(fg_scores, k)  # sorted desc
    cand_boxes = _gather_rows(
        boxes, top_idx.reshape(b, -1), gather_impl).reshape(b, c - 1, k, 4)
    # Score-threshold filter (strict >, generalized_ssd.py:371).
    cand_sc = jnp.where(top_sc > config.score_thresh, top_sc, _NEG_INF)

    keep = _nms_keep(
        cand_boxes.reshape(b * (c - 1), k, 4),
        cand_sc.reshape(b * (c - 1), k),
        config, nms_impl).reshape(b, c - 1, k)

    flat_sc = jnp.where(keep, cand_sc, _NEG_INF).reshape(b, -1)

    d = config.detections_per_img
    d2 = min(d, (c - 1) * k)  # pad below if fewer candidate slots than D
    out_scores, out_idx = jax.lax.top_k(flat_sc, d2)  # (B, D)
    valid = out_scores > _NEG_INF / 2
    # labels need no gather at all: the flat index encodes (class, cand)
    out_boxes = _gather_rows(
        cand_boxes.reshape(b, (c - 1) * k, 4), out_idx, gather_impl)
    out_boxes = jnp.where(valid[..., None], out_boxes, 0.0)
    out_labels = jnp.where(valid, (out_idx // k).astype(jnp.int32) + 1, 0)
    out_scores = jnp.where(valid, out_scores, 0.0)
    if d2 < d:
        pad = ((0, 0), (0, d - d2))
        out_boxes = jnp.pad(out_boxes, (*pad, (0, 0)))
        out_labels = jnp.pad(out_labels, pad)
        out_scores = jnp.pad(out_scores, pad)
        valid = jnp.pad(valid, pad)

    if original_sizes is not None:
        h, w = config.size
        ratio = original_sizes.astype(jnp.float32) / jnp.asarray(
            [h, w], jnp.float32)  # (B, 2) as (rh, rw)
        scale = jnp.stack(
            [ratio[:, 1], ratio[:, 0], ratio[:, 1], ratio[:, 0]], axis=-1)
        out_boxes = out_boxes * scale[:, None, :]

    return {"boxes": out_boxes, "scores": out_scores,
            "labels": out_labels, "valid": valid}


_FUSED_TIERS = (1024, 2048)  # per-image live-candidate capacities of the
#                      fast path, tried smallest-first per batch at run
#                      time (lax.switch). The 192-frame val asset
#                      measured mean 311 / max 1,319 live anchors per
#                      image: 2 of 3 b64 batches fit tier 1024
#                      (12.3 ms), the max-holding batch takes tier 2048
#                      (14.6 ms vs 27.2 ms reference fallback). The
#                      fast-path cost grows with R through the width-R
#                      top-k (1024 -> 1536 costs +1.6 ms; the K-wide NMS
#                      and the rank sorts are ~free), so the common case
#                      stays at the 1024 floor and heavy batches keep a
#                      1.55x-margin capacity instead of falling back.
#                      Measured A/B (same 3 trained-checkpoint batches):
#                      single R=1024 mean 17.1 ms (one fallback), single
#                      R=2048 mean 14.2 ms, tiers mean 13.1 ms.
_FUSED_SLOTS = 192   # 128-anchor chunk budget per image (measured on the
#                      round-3 trained checkpoint: mean 55 live chunks per
#                      image, max 144, p99 112 — see DESIGN.md)


def _postprocess_fused(
    scores: jnp.ndarray,
    all_boxes: jnp.ndarray,
    config: SSDConfig,
    original_sizes: Optional[jnp.ndarray],
    nms_impl: str,
    gather_impl: str,
) -> Dict[str, jnp.ndarray]:
    """Trained-model serving fast path: per-IMAGE global candidate select.

    On a trained model almost every (image, class) row has no
    above-threshold anchor (measured on the round-3 trained checkpoint:
    494 live rows of 5760, mean 324 / max 982 live anchors per image,
    landing in mean 55 / max 144 of the 2,274 per-image 128-anchor
    chunks), so the reference-shaped pipeline — per-class top-k over
    (B, C-1, A) and 5,760 NMS problems — sorts and suppresses
    overwhelmingly dead slots. This path instead:

      1. finds the live 128-anchor chunks of each image's flattened
         (C-1)*A score row, selects the first `_FUSED_SLOTS` of them in
         ascending chunk order (a 2,274-id sort, not a 291,060-score
         sort), gathers them, and top-k's the slots*128 gathered entries
         — provably every above-threshold entry when the guards hold;
      2. guards (checked per batch at run time, so semantics are exact
         on EVERY input): the smallest tier R holding every image's
         live-anchor count is lax.switch-ed in; a batch exceeding the
         largest tier, or any image exceeding the chunk budget, takes
         the reference pipeline. Random-weight inputs are dense and
         always take the fallback;
      3. candidate order equals lax.top_k's tie order for free: chunks
         are gathered ascending, so flat gathered position is ascending
         global position. The reference's per-class topk_candidates cap
         is reproduced IN-path: candidates are globally score-sorted, so
         a stable sort by class yields each class's candidates in its
         per-class rank order (within a class, ascending global position
         = ascending anchor index = lax.top_k's tie order); entries with
         rank >= cap are exactly those the reference drops pre-NMS — and
         being each class's lowest-ranked, they can never alter the keep
         decisions of earlier candidates in greedy NMS;
      4. gathers the R candidates' pre-decoded boxes; ONE class-offset NMS
         problem per image (torchvision batched_nms's trick, reference
         generalized_ssd.py:389) — cross-class IoU is 0, and each class's
         subsequence keeps its score order, so keep decisions equal the
         reference's per-class NMS;
      5. top detections_per_img of the kept scores.

    Takes the already-softmaxed scores (B, A, C) and already-decoded+
    clipped boxes (B, A, 4): ALL float math shared with the reference
    pipeline is hoisted to the caller's top level, outside the
    `lax.switch`, so the fallback branch and the standalone reference
    program see bit-identical inputs and the branches themselves are
    pure gather/sort/compare (kills the round-3 1-ulp branch-compilation
    rank swap, tools/diag_fused_mismatch.py).
    """
    b, a, c = scores.shape
    n = (c - 1) * a
    n_pad = -(-n // 128) * 128
    n_chunks = n_pad // 128
    d = config.detections_per_img
    slots = min(_FUSED_SLOTS, n_chunks)
    # tier capacities after problem-size clamping (dedup: tiny configs
    # collapse every tier to n or slots*128 — compile one branch, not
    # two identical ones)
    tiers = sorted({min(max(t, d), n, slots * 128) for t in _FUSED_TIERS})
    cap = min(config.topk_candidates, a)

    # Guard computation kept OUTSIDE the lax.switch is reductions only
    # (per-image live count, per-chunk liveness): XLA fuses them into
    # one pass over the scores without materializing any (B, n_pad)
    # intermediate. The big padded/flattened score copies are rebuilt
    # INSIDE the fused branches so the dense fallback never pays for
    # them (measured: the fallback regime used to trail the standalone
    # reference program by the cost of exactly these copies).
    live = jnp.swapaxes(scores[..., 1:], 1, 2) > config.score_thresh
    per_img = jnp.sum(live, axis=(1, 2))            # (B,)
    chunk_has = jnp.any(jnp.pad(
        live.reshape(b, n), ((0, 0), (0, n_pad - n))
    ).reshape(b, n_chunks, 128), axis=2)            # (B, n_chunks) bool
    # per_img counts ALL live anchors (conservative: entries beyond a
    # class's rank cap can never reach the output, but masking them
    # before the top-r selection would need full per-class ranks — the
    # very sort this path avoids).
    max_live = jnp.max(per_img)
    chunk_bad = jnp.any(jnp.sum(chunk_has, axis=1) > slots)

    def reference(_):
        return _postprocess_reference_core(
            scores, all_boxes, config, original_sizes, nms_impl=nms_impl,
            topk_impl="exact", gather_impl=gather_impl)

    def fused(r, _):
        # Rebuilt here (not captured from outside the switch): where/pad/
        # reshape are pure data movement + comparison, so recomputing them
        # per branch is bit-identical — and the fallback branch never
        # materializes these (B, n_pad) arrays.
        fg = jnp.swapaxes(scores[..., 1:], 1, 2)    # (B, C-1, A)
        flat = jnp.where(
            fg > config.score_thresh, fg, _NEG_INF).reshape(b, n)
        grouped = jnp.pad(flat, ((0, 0), (0, n_pad - n)),
                          constant_values=_NEG_INF).reshape(
                              b, n_chunks, 128)
        ids = jnp.where(chunk_has,
                        jnp.arange(n_chunks, dtype=jnp.int32)[None],
                        jnp.int32(n_chunks))
        sel = jax.lax.sort(ids, dimension=1)[:, :slots]   # ascending
        vslot = sel < n_chunks
        sel_c = jnp.minimum(sel, n_chunks - 1)
        g = jnp.take_along_axis(grouped, sel_c[:, :, None], axis=1)
        g = jnp.where(vslot[:, :, None], g, _NEG_INF)
        # top-r with the GLOBAL position carried through the sort, not
        # recovered afterwards: lax.top_k lowers to a full stable sort
        # of (value, iota) pairs anyway, and the round-5 serving trace
        # showed the post-top_k `take_along_axis(sel_c, gpos // 128)`
        # chunk-id lookup lowering to a 2.7 ms SMEM scalar gather —
        # ~15% of the whole b128 step. Sorting (-score, pos) pairs
        # directly costs the same as the sort top_k already does and
        # deletes that gather. Exactness: pos = sel_c[s]*128 + j is
        # strictly increasing in slot-space index s*128+j (sel is
        # sorted ascending), so a STABLE ascending sort of -score
        # breaks score ties by ascending pos — exactly lax.top_k's
        # smallest-index tie order in slot space mapped through the
        # same monotone position map; and -(-x) is a sign-bit flip,
        # bit-exact.
        sc_all = g.reshape(b, slots * 128)
        pos_full = (sel_c[:, :, None] * 128
                    + jnp.arange(128, dtype=jnp.int32)[None, None, :]
                    ).reshape(b, slots * 128)
        neg_s, pos = jax.lax.sort((-sc_all, pos_full), dimension=1,
                                  num_keys=1, is_stable=True)
        sc = -neg_s[:, :r]
        pos = jnp.minimum(pos[:, :r], n - 1)         # pad-chunk clamp
        cls = pos // a                               # 0-based fg class
        anch = pos % a
        boxes = _gather_rows(all_boxes, anch, gather_impl)
        # per-class rank via stable sort by class (candidates already in
        # global score order, so within-class order = per-class rank
        # order); rank = position - class-segment start. Dead slots all
        # sort after every live entry, so they can't distort live ranks.
        posn = jnp.broadcast_to(
            jnp.arange(r, dtype=jnp.int32)[None], (b, r))
        cls_s, pos_s = jax.lax.sort((cls, posn), dimension=1, num_keys=1)
        idx = jnp.arange(r, dtype=jnp.int32)[None]
        boundary = jnp.concatenate(
            [jnp.ones((b, 1), bool), cls_s[:, 1:] != cls_s[:, :-1]], axis=1)
        seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0), axis=1)
        rank_s = idx - seg_start
        _, rank = jax.lax.sort((pos_s, rank_s), dimension=1, num_keys=1)
        valid = (sc > config.score_thresh) & (rank < cap)
        # class-offset trick: one NMS problem per image
        offset = float(max(config.size)) + 2.0
        off = boxes + (cls.astype(jnp.float32) * offset)[..., None]
        nms_sc = jnp.where(valid, sc, _NEG_INF)
        # few-problem regime (P = batch): the raised vmem_cap is the
        # probed-safe K=2048 x chunk=128 point (see nms_keep_batch).
        keep = _nms_keep(off, nms_sc, config, nms_impl, chunk=128,
                         vmem_cap=262_144)  # (B, R)
        kept = jnp.where(keep, nms_sc, _NEG_INF)
        k2 = min(d, r)
        out_sc, oidx = jax.lax.top_k(kept, k2)
        valid_out = out_sc > _NEG_INF / 2
        ob = _gather_rows(boxes, oidx, gather_impl)
        ol = jnp.take_along_axis(cls, oidx, axis=1) + 1
        out_boxes = jnp.where(valid_out[..., None], ob, 0.0)
        out_labels = jnp.where(valid_out, ol, 0).astype(jnp.int32)
        out_scores = jnp.where(valid_out, out_sc, 0.0)
        if k2 < d:
            pad = ((0, 0), (0, d - k2))
            out_boxes = jnp.pad(out_boxes, (*pad, (0, 0)))
            out_labels = jnp.pad(out_labels, pad)
            out_scores = jnp.pad(out_scores, pad)
            valid_out = jnp.pad(valid_out, pad)
        if original_sizes is not None:
            h, w = config.size
            ratio = original_sizes.astype(jnp.float32) / jnp.asarray(
                [h, w], jnp.float32)
            scale = jnp.stack(
                [ratio[:, 1], ratio[:, 0], ratio[:, 1], ratio[:, 0]],
                axis=-1)
            out_boxes = out_boxes * scale[:, None, :]
        return {"boxes": out_boxes, "scores": out_scores,
                "labels": out_labels, "valid": valid_out}

    # smallest tier whose capacity holds every image; past the last
    # tier (or over the chunk budget) -> reference fallback.
    #
    # Dense-regime overhead attribution (tools/diag_fused_dense.py,
    # ssd300_vgg16 b64 postprocess-only, round 5): the guard reductions
    # feeding this switch's predicate are FREE (+0.03 ms vs the bare
    # reference pipeline, i.e. XLA folds them into the pass it already
    # makes over the scores), the switch dispatch is free, and the
    # remaining +5.4-5.8 ms (+8%) is the mere PRESENCE of the fused
    # tier branches: XLA hoists parts of their candidate machinery to
    # the program top level where the fallback pays for dead work.
    # Nesting the tier switch inside an outer two-way cond so the
    # common code would hoist only into the never-taken-when-dense arm
    # was built and MEASURED NO BETTER (+5.75 ms, identical trace) —
    # the hoisting survives the nesting — so the flat switch stays.
    # The price is paid only in the regime `fused` is documented not
    # to be for (random/dense inputs); e2e it is +1.8% on
    # ssd300_vgg16 b64, +7% on ssd512_vgg16 (STATUS gap #3).
    idx = sum((max_live > t).astype(jnp.int32) for t in tiers)
    idx = jnp.where(chunk_bad, len(tiers), idx)
    branches = [functools.partial(fused, t) for t in tiers] + [reference]
    return jax.lax.switch(idx, branches, operand=None)


@dataclasses.dataclass
class Detector:
    """A built detector: module + config + anchors + ready-to-jit functions.

    The builder-level bundle replacing the reference's monolithic `SSD`
    nn.Module instance (builders return one of these).
    """

    model: SSD
    config: SSDConfig
    anchors: np.ndarray  # (A, 4) xyxy in input pixels

    def init(self, rng: jax.Array, batch_size: int = 1) -> Any:
        x = jnp.zeros((batch_size, *self.config.size, 3), jnp.float32)
        return self.model.init(rng, x, train=False)

    def apply(self, variables: Any, images: jnp.ndarray, train: bool = False,
              **kwargs: Any) -> Any:
        return self.model.apply(variables, images, train=train, **kwargs)

    def loss(
        self,
        variables: Any,
        images: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_labels: jnp.ndarray,
        gt_valid: jnp.ndarray,
    ) -> Tuple[Dict[str, jnp.ndarray], Any]:
        """Training loss on a padded batch. Returns (loss dict, new batch_stats)."""
        from demonet_tpu.models.losses import multibox_loss  # cycle guard

        outputs, mutated = self.model.apply(
            variables, images, train=True, mutable=["batch_stats"])
        losses = multibox_loss(
            outputs["cls_logits"], outputs["bbox_regression"],
            jnp.asarray(self.anchors), gt_boxes, gt_labels, gt_valid,
            iou_thresh=self.config.iou_thresh,
            neg_to_pos_ratio=self.config.neg_to_pos_ratio,
            box_coder_weights=self.config.box_coder_weights)
        return losses, mutated

    def predict(
        self,
        variables: Any,
        images: jnp.ndarray,
        original_sizes: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Normalized float images (B, H, W, 3) in [0,1] -> padded detections."""
        x = preprocess(images, self.config)
        outputs = self.model.apply(variables, x, train=False)
        return postprocess_detections(
            outputs["cls_logits"], outputs["bbox_regression"],
            jnp.asarray(self.anchors), self.config, original_sizes)
