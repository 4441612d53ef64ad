#!/usr/bin/env python
"""Fused trained-model postprocess on real TPU: output equality with the
reference pipeline plus e2e timings for both paths. Companion to
tests/test_postprocess_fused.py (CPU equality on synthetic cases +
every family's real config).

Default: ssdlite320 with the ROUND-3 TRAINED weights + real val frames
(bench assets) — realistic score sparsity. --model <other family> runs
random weights + random frames (no trained checkpoint exists for those):
equality still must hold (the fused path is exact-by-construction with a
counted fallback), but the timing shows the dense-candidate regime.

    python tools/check_fused_tpu.py                  # trained, b64 + b1
    python tools/check_fused_tpu.py --model ssd300_vgg16,pelee304
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


def main(args) -> int:
    # --model accepts a comma-separated list: backend init through the
    # device tunnel costs minutes, so verifying several families in one
    # process amortizes the handshake.
    rc = 0
    for name in args.model.split(","):
        for b in args.batch:
            print(f"=== {name} b{b}{' bf16' if args.bf16 else ''} ===")
            rc |= check_model(name, b, args)
    return rc


def _iou_1_many(a, bs):
    x1 = np.maximum(a[0], bs[:, 0]); y1 = np.maximum(a[1], bs[:, 1])
    x2 = np.minimum(a[2], bs[:, 2]); y2 = np.minimum(a[3], bs[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (bs[:, 2] - bs[:, 0]) * (bs[:, 3] - bs[:, 1])
    union = area_a + area_b - inter
    return inter / np.where(union > 0, union, 1.0)


def _boundary_flip_ok(det, others, nms_thresh, tol=1e-5) -> bool:
    """True iff `det` (score, label, box) sits on an NMS suppression
    boundary against `others` (the other impl's kept dets): some kept
    same-class higher-scored det has IoU within `tol` of nms_thresh.
    Such a det's keep/suppress decision legitimately flips with 1-ulp
    IoU rounding differences between backends/program contexts
    (measured: a pair at |IoU - 0.55| = 6.6e-7 flipped between the CPU
    and TPU compilations of the REFERENCE pipeline itself)."""
    s, l, b = det
    m = (others["labels"] == l) & (others["scores"] >= s - tol)
    if not m.any():
        return False
    ious = _iou_1_many(b.astype(np.float64),
                       others["boxes"][m].astype(np.float64))
    return bool(np.any(np.abs(ious - nms_thresh) <= tol))


def _set_match_ok(ref, fus, batch, nms_thresh, tol=1e-5) -> bool:
    """Order-insensitive per-image detection match: greedily pair each
    fused det with an unused ref det of the same label, |dscore| <= tol,
    box within atol 1e-3. Dets that fail to pair (in either direction)
    are accepted ONLY if they sit on an NMS-threshold IoU boundary
    (_boundary_flip_ok); anything else fails."""
    excused = 0
    for i in range(batch):
        rm, fm = ref["valid"][i], fus["valid"][i]
        rs, fs = ref["scores"][i][rm], fus["scores"][i][fm]
        rl, fl = ref["labels"][i][rm], fus["labels"][i][fm]
        rb, fb = ref["boxes"][i][rm], fus["boxes"][i][fm]
        used = np.zeros(len(rs), bool)
        ref_kept = {"scores": rs, "labels": rl, "boxes": rb}
        fus_kept = {"scores": fs, "labels": fl, "boxes": fb}
        for p in range(len(fs)):
            cand = np.nonzero(
                ~used & (rl == fl[p]) & (np.abs(rs - fs[p]) <= tol)
                & (np.abs(rb - fb[p]).max(axis=-1)
                   <= 1e-3 + 1e-5 * np.abs(fb[p]).max()))[0]
            if len(cand):
                used[cand[0]] = True
            elif _boundary_flip_ok((fs[p], fl[p], fb[p]), ref_kept,
                                   nms_thresh, tol):
                excused += 1
            else:
                return False
        for q in np.nonzero(~used)[0]:
            if _boundary_flip_ok((rs[q], rl[q], rb[q]), fus_kept,
                                 nms_thresh, tol):
                excused += 1
            else:
                return False
    if excused:
        print(f"  ({excused} boundary-IoU suppression flips excused)")
    return True


def check_model(model_name: str, b: int, args) -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    from demonet_tpu.models import get_model
    from demonet_tpu.models.detection import (
        postprocess_detections, preprocess)

    kw = {"dtype": jnp.bfloat16} if args.bf16 else {}
    det = get_model(model_name, num_classes=91, **kw)
    h, w = det.config.size
    trained = model_name == "ssdlite320_mobilenet_v3_large" and os.path.exists(
        "bench_assets/ssdlite320_shapes_trained.npz")
    if trained:
        from tools.export_bench_images import load_bench_images
        from tools.export_bench_weights import load_bench_variables

        v = jax.device_put(load_bench_variables(
            "bench_assets/ssdlite320_shapes_trained.npz"))
        arr = load_bench_images("bench_assets/val_images_320.npz", 192)
        print("weights: round-3 trained checkpoint; inputs: real val frames")
    else:
        v = jax.device_put(det.init(jax.random.PRNGKey(0)))
        arr = np.random.default_rng(0).random((192, h, w, 3), np.float32)
        print(f"weights: random init; inputs: random frames ({model_name})")
    n_bufs = max(2, min(3, len(arr) // b)) if b <= len(arr) else 2
    # cycle the frame pool when b doesn't divide it (e.g. b128 over the
    # 192-frame asset): distinct buffers, every frame real
    idx = np.arange(n_bufs * b) % len(arr)
    bufs = [jnp.asarray(arr[idx[i * b:(i + 1) * b]]) for i in range(n_bufs)]
    anchors = jnp.asarray(det.anchors)

    def fwd(impl):
        def f(variables, images):
            x = preprocess(images, det.config, resize=False)
            out = det.model.apply(variables, x, train=False)
            return postprocess_detections(
                out["cls_logits"], out["bbox_regression"], anchors,
                det.config, impl=impl)
        return jax.jit(f)

    jr, jf = fwd("reference"), fwd("fused")

    # Equality gate: ONE program computes the trunk once and feeds both
    # postprocess impls — the fast path's contract is postprocess
    # equality GIVEN the logits. Two separately-jitted programs can
    # compile the trunk with different fusion rounding (observed with
    # --bf16: threshold-straddling scores flip between programs), which
    # would test compiler determinism, not the fused path.
    def both(variables, images):
        x = preprocess(images, det.config, resize=False)
        out = det.model.apply(variables, x, train=False)
        a = (out["cls_logits"], out["bbox_regression"], anchors, det.config)
        return (postprocess_detections(*a, impl="reference"),
                postprocess_detections(*a, impl="fused"))

    jboth = jax.jit(both)

    ok = True
    for i, buf in enumerate(bufs):
        ref, fus = jax.device_get(jboth(v, buf))
        val_eq = bool((ref["valid"] == fus["valid"]).all())
        # scores: the trained path exercises the fused FAST branch, which
        # is exact-by-construction -> gate on bitwise equality there. On
        # random weights the candidates are dense and the lax.cond
        # FALLBACK branch executes; XLA may compile that in-program copy
        # of the reference pipeline with different fusion rounding than
        # the standalone reference program (~1e-7), so gate on a tight
        # allclose and report exactness separately.
        sc_eq = sc_close = lb_eq = bx_close = False
        if val_eq:
            m = ref["valid"]
            sc_eq = bool((ref["scores"][m] == fus["scores"][m]).all())
            sc_close = bool(np.allclose(ref["scores"][m], fus["scores"][m],
                                        rtol=1e-5, atol=1e-7))
            lb_eq = bool((ref["labels"][m] == fus["labels"][m]).all())
            bx_close = bool(np.allclose(ref["boxes"][m], fus["boxes"][m],
                                        rtol=1e-5, atol=1e-3))
        n = int(ref["valid"].sum())
        strict = val_eq and (sc_eq if trained else sc_close) \
            and lb_eq and bx_close
        # Non-strict regimes: (a) the cond fallback branch can round
        # scores one ulp differently from the standalone reference
        # program (measured max 6e-8 — tools/diag_fused_mismatch.py,
        # ssd512_vgg16), so NEAR-TIED detections may swap adjacent
        # ranks; (b) a pairwise IoU within ~1 ulp of nms_thresh flips a
        # suppression decision between backends/program contexts
        # (measured |IoU-0.55| = 6.6e-7 with a bf16 trunk — the
        # REFERENCE pipeline itself flips CPU vs TPU there). Gate with
        # the tolerance-aware per-image set match; unpairable dets are
        # accepted only as boundary-IoU suppression flips.
        set_ok = strict or _set_match_ok(ref, fus, b, det.config.nms_thresh)
        print(f"batch {i}: dets={n} valid_eq={val_eq} scores_eq={sc_eq} "
              f"scores_close={sc_close} labels_eq={lb_eq} "
              f"boxes_close={bx_close}"
              + ("" if strict else f" set_match_ok={set_ok}"))
        ok &= set_ok

    def _sync(out):
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(out)[0].ravel()[0]))

    print(f"--- e2e b{b} timing ---")
    for f, label in ((jr, "reference"), (jf, "fused")):
        for i in range(3):
            out = f(v, bufs[i % n_bufs])
        _sync(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = f(v, bufs[i % n_bufs])
        _sync(out)
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{label}: pipelined {dt:.2f} ms/b ({b / dt * 1000:.0f} img/s)",
              end="  ")
        lats = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            _sync(f(v, bufs[i % n_bufs]))
            lats.append(time.perf_counter() - t0)
        lats.sort()
        print(f"blocking p50 {lats[len(lats) // 2] * 1000:.2f} ms")

    print("ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ssdlite320_mobilenet_v3_large")
    p.add_argument("--batch", type=int, nargs="+", default=[64])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 trunk (postprocess stays fp32 per the "
                        "precision policy); both impls see the same logits, "
                        "so the equality gates are unchanged")
    sys.exit(main(p.parse_args()))
