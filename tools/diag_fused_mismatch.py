#!/usr/bin/env python
"""Diagnose fused-vs-reference postprocess mismatches on random weights
(the lax.cond FALLBACK regime — tools/check_fused_tpu.py saw ssd512_vgg16
batch 1 disagree on labels/boxes while scores stayed allclose).

Hypothesis under test: the in-program copy of the reference pipeline
(inside the fused program's fallback branch) compiles with different
fusion rounding (~1e-7 on scores); near-tied candidates then sort in a
different order, so position-wise labels/boxes differ while the
per-image detection MULTISET matches within tolerance.

Evidence printed per mismatching image:
  * positions where labels differ, with both scores and |dscore|
  * greedy tolerance-aware bipartite match of the two detection sets
    (score within 1e-5, IoU > 0.99 or same box) -> unmatched counts
  * a control: the REFERENCE impl alone, jitted in a different program
    context (with an extra consumer of the logits), vs the standalone
    reference program — if its scores also differ ~1e-7, the rounding is
    a compile-context artifact, not a fused-algorithm defect.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(args) -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    from demonet_tpu.models import get_model
    from demonet_tpu.models.detection import (
        postprocess_detections, preprocess)

    det = get_model(args.model, num_classes=91)
    h, w = det.config.size
    v = jax.device_put(det.init(jax.random.PRNGKey(0)))
    arr = np.random.default_rng(0).random((192, h, w, 3), np.float32)
    b = args.batch
    buf = jnp.asarray(arr[args.buf_index * b:(args.buf_index + 1) * b])
    anchors = jnp.asarray(det.anchors)

    def fwd(impl, extra_consumer=False):
        def f(variables, images):
            x = preprocess(images, det.config, resize=False)
            out = det.model.apply(variables, x, train=False)
            res = postprocess_detections(
                out["cls_logits"], out["bbox_regression"], anchors,
                det.config, impl=impl)
            if extra_consumer:
                res = dict(res, _aux=jnp.sum(out["cls_logits"]))
            return res
        return jax.jit(f)

    ref = jax.device_get(fwd("reference")(v, buf))
    fus = jax.device_get(fwd("fused")(v, buf))
    # control: same reference impl, different fusion context
    ctl = jax.device_get(fwd("reference", extra_consumer=True)(v, buf))

    d = np.abs(ref["scores"] - ctl["scores"])[ref["valid"]]
    print(f"control (reference impl, different program context): "
          f"max|dscore|={d.max():.3g} over {d.size} dets; "
          f"labels_eq={bool((ref['labels'][ref['valid']] == ctl['labels'][ref['valid']]).all())}")

    n_img_mismatch = 0
    worst = 0.0
    for i in range(b):
        m = ref["valid"][i]
        if (ref["labels"][i][m] == fus["labels"][i][m]).all():
            continue
        n_img_mismatch += 1
        pos = np.nonzero(ref["labels"][i][m] != fus["labels"][i][m])[0]
        rs, fs = ref["scores"][i][m], fus["scores"][i][m]
        if n_img_mismatch <= args.verbose_images:
            print(f"image {i}: {len(pos)} label mismatches at ranks "
                  f"{pos[:12].tolist()}")
            for p in pos[:8]:
                print(f"  rank {p}: ref (lab {ref['labels'][i][p]}, "
                      f"score {rs[p]:.9f})  fused (lab {fus['labels'][i][p]},"
                      f" score {fs[p]:.9f})  |d|={abs(rs[p]-fs[p]):.3g}")
        # tolerance-aware set match: for every fused det, find an unused
        # ref det with |dscore|<=tol and same label
        used = np.zeros(len(rs), bool)
        unmatched = 0
        for p in range(len(fs)):
            cand = np.nonzero(~used
                              & (np.abs(rs - fs[p]) <= args.tol)
                              & (ref["labels"][i][:len(rs)]
                                 == fus["labels"][i][p]))[0]
            if len(cand):
                used[cand[0]] = True
            else:
                unmatched += 1
        worst = max(worst, unmatched / max(1, len(fs)))
        print(f"image {i}: set-match unmatched={unmatched}/{len(fs)}")
    print(f"images with positional label mismatch: {n_img_mismatch}/{b}; "
          f"worst unmatched fraction {worst:.4f}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ssd512_vgg16")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--buf-index", type=int, default=1)
    p.add_argument("--tol", type=float, default=1e-5)
    p.add_argument("--verbose-images", type=int, default=4)
    sys.exit(main(p.parse_args()))
