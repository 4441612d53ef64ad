#!/usr/bin/env python
"""Attribute the fused postprocess's dense-regime overhead (VERDICT r4
weak #2 / item 5).

On random weights every anchor is live (softmax scores ~1/C > 0.01), so
`impl="fused"` always takes its reference fallback branch — yet round 4
measured the full ssd512 program at +7% vs `impl="reference"` (320.8 vs
299.2 ms b64) and ssd300 at +1.8%. The suspects: (a) the guard
reductions (per-image live count + per-chunk liveness over the
(B, C-1, A) score view), (b) the `lax.switch` itself (branch dispatch +
lost cross-branch fusion), (c) mere presence of the unused fused-tier
branches in the program.

This tool times the POSTPROCESS alone (trunk outputs precomputed and
frozen — the trunk is identical across variants and only adds noise):

  ref          postprocess_detections(impl="reference")
  fused        postprocess_detections(impl="fused")  [fallback taken]
  guard+ref    guard reductions computed + consumed via a 1-element
               select, then the reference core called DIRECTLY
               (isolates guard cost, no switch)
  switch1      guards + lax.switch with the reference core as the ONLY
               branch (isolates switch dispatch; diff vs guard+ref)

so: guard cost = guard+ref - ref; switch cost = switch1 - guard+ref;
unused-branch cost = fused - switch1.

    python tools/diag_fused_dense.py --model ssd512_vgg16 --batch 64
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

WARMUP = 3
ITERS = 20


def _sync(result) -> None:
    leaf = jax.tree_util.tree_leaves(result)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ssd512_vgg16")
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()

    assert jax.default_backend() == "tpu", jax.default_backend()
    from demonet_tpu.models import get_model
    from demonet_tpu.models import detection as D

    det = get_model(args.model, num_classes=91)
    variables = det.init(jax.random.PRNGKey(0))
    h, w = det.config.size
    b = args.batch
    images = jnp.asarray(
        np.random.RandomState(0).rand(b, h, w, 3), jnp.float32)
    anchors = jnp.asarray(det.anchors)
    cfg = det.config

    # trunk outputs, computed once and frozen
    out = jax.jit(lambda v, x: det.model.apply(
        v, D.preprocess(x, cfg, resize=False), train=False))(
            variables, images)
    logits = jax.device_get(out["cls_logits"])
    regr = jax.device_get(out["bbox_regression"])
    print(f"{args.model} b{b}: A={logits.shape[1]} C={logits.shape[2]}")
    logits = jnp.asarray(logits)
    regr = jnp.asarray(regr)

    def shared(lg, rg):
        scores = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
        boxes = D.decode_boxes(rg.astype(jnp.float32), anchors[None],
                               cfg.box_coder_weights)
        return scores, D.clip_boxes_to_image(boxes, cfg.size)

    def ref(lg, rg):
        scores, boxes = shared(lg, rg)
        return D._postprocess_reference_core(
            scores, boxes, cfg, None, "auto", "exact", "auto")

    def fused(lg, rg):
        scores, boxes = shared(lg, rg)
        return D._postprocess_fused(scores, boxes, cfg, None, "auto", "auto")

    def _guards(scores):
        bb, a, c = scores.shape
        n = (c - 1) * a
        n_pad = -(-n // 128) * 128
        n_chunks = n_pad // 128
        slots = min(D._FUSED_SLOTS, n_chunks)
        live = jnp.swapaxes(scores[..., 1:], 1, 2) > cfg.score_thresh
        per_img = jnp.sum(live, axis=(1, 2))
        chunk_has = jnp.any(jnp.pad(
            live.reshape(bb, n), ((0, 0), (0, n_pad - n))
        ).reshape(bb, n_chunks, 128), axis=2)
        max_live = jnp.max(per_img)
        chunk_bad = jnp.any(jnp.sum(chunk_has, axis=1) > slots)
        d = cfg.detections_per_img
        tiers = sorted({min(max(t, d), n, slots * 128)
                        for t in D._FUSED_TIERS})
        idx = sum((max_live > t).astype(jnp.int32) for t in tiers)
        return jnp.where(chunk_bad, len(tiers), idx)

    def guard_ref(lg, rg):
        scores, boxes = shared(lg, rg)
        idx = _guards(scores)
        o = D._postprocess_reference_core(
            scores, boxes, cfg, None, "auto", "exact", "auto")
        # consume idx so it isn't DCE'd: 1-element arithmetic, ~free
        o["scores"] = o["scores"] + 0.0 * idx.astype(jnp.float32)
        return o

    def switch1(lg, rg):
        scores, boxes = shared(lg, rg)
        idx = _guards(scores)

        def branch(_):
            return D._postprocess_reference_core(
                scores, boxes, cfg, None, "auto", "exact", "auto")
        return jax.lax.switch(jnp.minimum(idx, 0), [branch], operand=None)

    rows = []
    for name, f in (("ref", ref), ("fused", fused),
                    ("guard+ref", guard_ref), ("switch1", switch1)):
        jf = jax.jit(f)
        o = jf(logits, regr)
        _sync(o)
        for _ in range(WARMUP):
            o = jf(logits, regr)
        _sync(o)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            o = jf(logits, regr)
        _sync(o)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        rows.append((name, dt))
        print(f"  {name:10s} {dt:8.2f} ms")
    base = rows[0][1]
    for name, dt in rows[1:]:
        print(f"  {name:10s} +{dt - base:6.2f} ms vs ref "
              f"({100 * (dt - base) / base:+.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
