"""Benchmark harness: ssdlite320_mobilenet_v3_large end-to-end inference
throughput (preproc -> backbone -> heads -> decode -> NMS, all on device).

Prints a complete JSON line after EVERY measured section (flushed), each a
superset of the previous:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
The driver reads the tail, so the LAST complete line wins — a mid-run kill
or the wall-clock budget (env BENCH_BUDGET_S, default 1200s) can only cost
the not-yet-measured sections, never the whole round's evidence
(VERDICT r4 weak #1: the single print-at-end lost round 4's numbers to a
timeout).

Honesty notes:
  * Inputs are fixed-seed RANDOM images (zeros would give degenerate
    NMS/sort workloads), cycled across several distinct device buffers so
    neither XLA nor the device tunnel can cache a repeated call.
  * The timing barrier is a tiny device->host transfer of the last result
    (block_until_ready can return before remote execution completes on
    tunneled hosts — see STATUS.md).
  * vs_baseline: the reference (zhiqwang/demonet) publishes NO throughput
    numbers (BASELINE.json "published": {}), so there is no reference
    figure to normalize against. The ratio reported here is the b64
    continuity row against THIS harness's first recorded b64 run on the
    same class of device (.bench_baseline.json, committed: 1645.3 img/s at
    round 1's start) — i.e. self-progress, not a torch comparison.
  * Headline batch is 128 since round 4 (the measured throughput sweet
    spot, DESIGN.md "Batch scaling"; b256 regresses); the b64 rows remain
    for cross-round continuity.
  * Roofline accountability (VERDICT r3 weak #2): each timed program also
    reports XLA's compiled cost analysis (algebraic FLOPs + HBM bytes
    accessed) as achieved TFLOP/s, HBM GB/s, and % of the device's public
    peak (v5e: 197 bf16 TFLOP/s, 819 GB/s). These are model-level
    utilization numbers against XLA's own cost model — good for trend
    regression and bound checks, not a hardware counter measurement.
  * Train rows use REAL ground truth (bench_assets/val_gt_320.npz, the
    shapes-corpus val GT for the same frames as the image asset) so the
    matcher / hard-negative-mining traffic is representative
    (VERDICT r4 weak #4); the field "train_gt" records the source.
  * Every program is AOT-compiled ONCE (jit(f).lower().compile()) and that
    executable serves both the timing loop and the cost analysis — round 4
    compiled the cost-analysis copy separately, roughly doubling several
    sections' compile time. A persistent compilation cache (.jax_cache/,
    gitignored) makes reruns on the same host compile-free.
  * The fp32 VGG train row runs only under --full / BENCH_FULL=1 (it is a
    dtype-headroom diagnostic, not a shipped config — VERDICT r4 item 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

# Persistent compilation cache: the driver re-runs this file on the same
# host right after the build session — with the cache warm, its run is
# execution-only (~20x faster first calls, measured).
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BATCH = 64            # continuity rows (rounds 1-3 headline batch)
HEADLINE_BATCH = 128  # measured sweet spot (DESIGN.md "Batch scaling")
WARMUP = 3
ITERS = 20
N_BUFFERS = 4
BASELINE_FILE = os.path.join(REPO, ".bench_baseline.json")

_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))
FULL = bool(os.environ.get("BENCH_FULL")) or "--full" in sys.argv[1:]
# BENCH_ONLY=train_vgg_bf16[,sec...] runs just the named sections — for
# re-measuring one row after a change without paying the full harness.
ONLY = {s for s in os.environ.get("BENCH_ONLY", "").split(",") if s}

# (peak FLOP/s, peak HBM bytes/s) by device_kind prefix — public specs.
# bf16 MXU peak; fp32 programs are reported against the same peak (the
# MXU is bf16-native, so fp32 "MFU" deliberately shows the dtype headroom).
_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),  # v5e
    "TPU v4": (275e12, 1228e9),
    "TPU v6 lite": (918e12, 1640e9),  # v6e
}

PAYLOAD: dict = {}
DONE: list = []
SKIPPED: list = []
_VS_BASELINE = [1.0]


def _elapsed() -> float:
    return time.monotonic() - _T0


def emit() -> None:
    """Print one COMPLETE result line reflecting everything measured so
    far; the driver parses the last line of stdout."""
    print(json.dumps({
        "metric": "ssdlite320_mobilenet_v3_large e2e inference throughput "
                  "(b128)",
        "value": PAYLOAD.get("b128_img_s", 0.0),
        "unit": "images/sec/chip",
        "vs_baseline": round(_VS_BASELINE[0], 3),
        "vs_baseline_meaning": "b64 continuity row vs this harness's first "
                               "recorded b64 run (reference publishes no "
                               "throughput numbers)",
        "batch": HEADLINE_BATCH,
        "input": "fixed-seed random images",
        "device": str(jax.devices()[0]),
        "roofline_note": "tflops/hbm from XLA compiled cost analysis vs "
                         "public v5e peaks (197 bf16 TFLOP/s, 819 GB/s); "
                         "'bytes accessed' is the cost model's op-level "
                         "count, so hbm_util_pct > 100 means fused reuse "
                         "overcounting, not physics — see "
                         "tools/roofline_report.py for the analytic floor",
        "sections_done": list(DONE),
        "skipped": list(SKIPPED),
        "elapsed_s": round(_elapsed(), 1),
        **PAYLOAD,
    }), flush=True)


def section(name: str, est_s: float, fn) -> None:
    """Run one measured section inside the wall-clock budget.

    A section whose cold-cache estimate no longer fits is recorded in
    "skipped" instead of risking the whole run; a section that raises
    records `<name>_error` and the harness moves on. Either way a fresh
    complete line is emitted."""
    if ONLY and name not in ONLY:
        SKIPPED.append(f"{name} (BENCH_ONLY)")
        return
    if _elapsed() + est_s > BUDGET_S:
        SKIPPED.append(name)
        emit()
        return
    t0 = time.monotonic()
    try:
        fn()
        DONE.append(name)
        PAYLOAD[f"_t_{name}_s"] = round(time.monotonic() - t0, 1)
    except Exception as e:  # keep the bench emitting on any failure
        PAYLOAD[f"{name}_error"] = repr(e)[:200]
    emit()


def _sync(result) -> None:
    """Force completion: fetch one element to the host."""
    leaf = jax.tree_util.tree_leaves(result)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _device_peaks():
    kind = jax.devices()[0].device_kind
    for prefix, peaks in _PEAKS.items():
        if kind.startswith(prefix):
            return peaks
    return None


def _aot(f, *args):
    """AOT-compile once; returns (compiled_executable, (flops, bytes)).

    One compile serves both timing and cost analysis (round 4's
    _cost_analysis recompiled the program a second time)."""
    jf = f if hasattr(f, "lower") else jax.jit(f)
    compiled = jf.lower(*args).compile()
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        cost = (float(c.get("flops", 0.0)),
                float(c.get("bytes accessed", 0.0)))
    except Exception:
        cost = (0.0, 0.0)
    return compiled, cost


def _roofline(flops: float, hbm_bytes: float, seconds: float) -> dict:
    """Achieved TFLOP/s + HBM GB/s (+ % of device peak when known)."""
    out = {}
    if flops and seconds > 0:
        out["tflops"] = round(flops / seconds / 1e12, 2)
    if hbm_bytes and seconds > 0:
        out["hbm_gb_s"] = round(hbm_bytes / seconds / 1e9, 1)
    peaks = _device_peaks()
    if peaks:
        peak_flops, peak_bw = peaks
        if flops and seconds > 0:
            out["mfu_pct"] = round(100 * flops / seconds / peak_flops, 1)
        if hbm_bytes and seconds > 0:
            out["hbm_util_pct"] = round(
                100 * hbm_bytes / seconds / peak_bw, 1)
    return out


def _time_pipelined(f, args_list, iters=ITERS, warmup=WARMUP):
    """Amortized seconds per call over cycled distinct input buffers.
    `f` is an already-compiled executable (see _aot)."""
    out = f(*args_list[0])
    _sync(out)
    for i in range(warmup):
        out = f(*args_list[i % len(args_list)])
    _sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(*args_list[i % len(args_list)])
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from __graft_entry__ import entry

    fn, (variables, _) = entry()
    rng = np.random.default_rng(0)

    def make_inputs(batch):
        return [jnp.asarray(rng.random((batch, 320, 320, 3), np.float32))
                for _ in range(N_BUFFERS)]

    # ---- section 1: e2e inference, exact reference semantics, random
    # weights: headline b128 + continuity b64 + vs_baseline --------------
    def s_infer():
        for batch, key in ((HEADLINE_BATCH, "b128"), (BATCH, "b64")):
            inputs = make_inputs(batch)
            jax.block_until_ready(inputs)
            cf, (fl, by) = _aot(fn, variables, inputs[0])
            dt = _time_pipelined(cf, [(variables, x) for x in inputs])
            PAYLOAD[f"{key}_img_s"] = round(batch / dt, 2)
            if batch == HEADLINE_BATCH:
                PAYLOAD.update({f"infer_{k}": v for k, v in
                                _roofline(fl, by, dt).items()})
        b64 = PAYLOAD["b64_img_s"]
        if os.path.exists(BASELINE_FILE):
            try:
                with open(BASELINE_FILE) as f:
                    base = json.load(f)
                if base.get("value"):
                    _VS_BASELINE[0] = b64 / float(base["value"])
            except Exception:
                pass
        else:
            try:
                with open(BASELINE_FILE, "w") as f:
                    json.dump({"value": b64, "unit": "images/sec/chip"}, f)
            except Exception:
                pass

    section("infer", 180, s_infer)

    # ---- section 2: batch-1 latency: per-call blocking p50 (includes
    # host/tunnel sync) and pipelined (amortized device time) ------------
    def s_b1():
        inputs1 = make_inputs(1)
        cf, _ = _aot(fn, variables, inputs1[0])
        _sync(cf(variables, inputs1[0]))
        lats = []
        for i in range(ITERS):
            t0 = time.perf_counter()
            _sync(cf(variables, inputs1[i % N_BUFFERS]))
            lats.append(time.perf_counter() - t0)
        lats.sort()
        PAYLOAD["p50_latency_b1_ms"] = round(
            lats[len(lats) // 2] * 1000.0, 3)
        PAYLOAD["b1_pipelined_ms"] = round(_time_pipelined(
            cf, [(variables, x) for x in inputs1]) * 1000.0, 3)

    section("latency_b1", 90, s_b1)

    # ---- trained-weights serving (VERDICT r2 weak #3): realistic score
    # sparsity — most (image, class) rows have no above-threshold
    # candidates, the regime the fused postprocess exploits. Weights are
    # the round-3 real-training checkpoint (tools/export_bench_weights.py);
    # inputs are real val frames (random noise under a trained model is
    # all background — unrealistically sparse). ---------------------------
    trained_path = os.path.join(REPO, "bench_assets",
                                "ssdlite320_shapes_trained.npz")
    img_asset = os.path.join(REPO, "bench_assets", "val_images_320.npz")
    tctx = {}

    def _trained_ctx():
        """Build (and cache) the trained detector + input buffers."""
        if tctx:
            return tctx
        from tools.export_bench_weights import load_bench_variables
        from demonet_tpu.models import ssdlite320_mobilenet_v3_large
        from demonet_tpu.models.detection import (
            postprocess_detections, preprocess)

        det = ssdlite320_mobilenet_v3_large(num_classes=91)
        tctx["det"] = det
        tctx["tv"] = jax.device_put(load_bench_variables(trained_path))
        tctx["anchors"] = jnp.asarray(det.anchors)
        if os.path.exists(img_asset):
            from tools.export_bench_images import load_bench_images

            arr = load_bench_images(img_asset, 192)
            PAYLOAD["trained_input"] = "real val frames (bench asset)"

            def t_inputs(batch):
                idx = np.arange(N_BUFFERS * batch) % len(arr)
                return [jnp.asarray(arr[idx[i * batch:(i + 1) * batch]])
                        for i in range(N_BUFFERS)]
        else:
            PAYLOAD["trained_input"] = "random (image asset missing)"
            t_inputs = make_inputs
        tctx["t_inputs"] = t_inputs

        def fwd(impl, dtype=None):
            d = det if dtype is None else ssdlite320_mobilenet_v3_large(
                num_classes=91, dtype=dtype)

            def f(variables, images):
                x = preprocess(images, d.config, resize=False)
                out = d.model.apply(variables, x, train=False)
                return postprocess_detections(
                    out["cls_logits"], out["bbox_regression"],
                    tctx["anchors"], d.config, impl=impl)
            return f
        tctx["fwd"] = fwd
        PAYLOAD["trained_weights"] = (
            "round-3 shapes-corpus checkpoint (real multi-epoch training "
            "run; see runs/ logs + docs/trainrun_r3/TRAINRUN.md)")
        return tctx

    def _trained_rows(batch):
        # "fused" = the trained-model fast path (per-image global select +
        # one class-offset NMS problem per image) with the count-proven
        # exact fallback — see models/detection._postprocess_fused
        ctx = _trained_ctx()
        bufs = ctx["t_inputs"](batch)
        for label, impl in ((f"trained_b{batch}_img_s", "reference"),
                            (f"trained_fused_b{batch}_img_s", "fused")):
            cf, (fl, by) = _aot(ctx["fwd"](impl), ctx["tv"], bufs[0])
            dt = _time_pipelined(cf, [(ctx["tv"], x) for x in bufs])
            PAYLOAD[label] = round(batch / dt, 2)
            if batch == HEADLINE_BATCH and impl == "fused":
                PAYLOAD.update({f"trained_fused_{k}": v for k, v in
                                _roofline(fl, by, dt).items()})

    if os.path.exists(trained_path):
        section("trained_b128", 150, lambda: _trained_rows(HEADLINE_BATCH))

        # serving-grade bf16 trunk (postprocess stays fp32 per the
        # precision policy; outputs are not bitwise vs the fp32 trunk —
        # this is the deploy-throughput row, the fp32 rows above are the
        # exactness-gated ones). The analytic HBM floor halves in bf16
        # (tools/roofline_report.py).
        def s_bf16():
            ctx = _trained_ctx()
            bufs = ctx["t_inputs"](HEADLINE_BATCH)
            cf, _ = _aot(ctx["fwd"]("fused", jnp.bfloat16),
                         ctx["tv"], bufs[0])
            dt = _time_pipelined(cf, [(ctx["tv"], x) for x in bufs])
            PAYLOAD[f"trained_fused_bf16_b{HEADLINE_BATCH}_img_s"] = round(
                HEADLINE_BATCH / dt, 2)

        section("trained_bf16", 90, s_bf16)
        section("trained_b64", 120, lambda: _trained_rows(BATCH))

    # ---- training throughput, headline config: bf16 + lane-packed early
    # trunk, K optimizer steps per dispatch (engine/train.py steps_per_call
    # amortizes per-step host dispatch; DESIGN.md "Multi-step dispatch").
    # GT is the real shapes-corpus val GT for the same frames as the image
    # asset (VERDICT r4 weak #4; degenerate single-box fallback only if
    # the assets are missing). -------------------------------------------
    gt_asset = os.path.join(REPO, "bench_assets", "val_gt_320.npz")

    def _train_batch(spc, batch):
        n = spc * batch
        if os.path.exists(gt_asset) and os.path.exists(img_asset):
            from tools.export_bench_gt import load_bench_gt
            from tools.export_bench_images import load_bench_images

            imgs = load_bench_images(img_asset, n)
            gt = load_bench_gt(gt_asset, n)
            PAYLOAD["train_gt"] = "shapes-corpus val GT (bench asset)"
            g = gt["gt_boxes"].shape[1]
            return {
                "images": jnp.asarray(
                    imgs.reshape(spc, batch, 320, 320, 3)),
                "gt_boxes": jnp.asarray(
                    gt["gt_boxes"].reshape(spc, batch, g, 4)),
                "gt_labels": jnp.asarray(
                    gt["gt_labels"].reshape(spc, batch, g)),
                "gt_valid": jnp.asarray(
                    gt["gt_valid"].reshape(spc, batch, g)),
            }
        PAYLOAD["train_gt"] = "degenerate single box (assets missing)"
        return {
            "images": jnp.asarray(
                rng.random((spc, batch, 320, 320, 3), np.float32)),
            "gt_boxes": jnp.tile(jnp.asarray(
                [[[[20.0, 20.0, 120.0, 120.0]]]]), (spc, batch, 1, 1)),
            "gt_labels": jnp.full((spc, batch, 1), 1, jnp.int32),
            "gt_valid": jnp.ones((spc, batch, 1), bool),
        }

    def _time_train(tstep, tstate, tb, spc):
        cf, cost = _aot(tstep, tstate, tb)
        tstate, _ = cf(tstate, tb)
        _sync(tstate.params)
        for _ in range(2):
            tstate, _ = cf(tstate, tb)
        _sync(tstate.params)
        t0 = time.perf_counter()
        t_iters = 8
        for _ in range(t_iters):
            tstate, _ = cf(tstate, tb)
        _sync(tstate.params)
        return (time.perf_counter() - t0) / (t_iters * spc), cost

    def s_train():
        from demonet_tpu.engine import (
            create_train_state, make_lr_schedule, make_optimizer,
            make_train_step)
        from demonet_tpu.models import ssdlite320_mobilenet_v3_large

        tdet = ssdlite320_mobilenet_v3_large(
            num_classes=91, dtype=jnp.bfloat16, lane_pack=True)
        tx = make_optimizer(make_lr_schedule(0.02, 100))
        # b128 spc8: the shipped config (DESIGN.md "Batch scaling" sweet
        # spot; spc8 measured 39.58 vs spc4 39.82 ms); b64 spc8: rounds
        # 1-3 continuity config
        for tb_batch, spc, label in (
                (128, 8, "train_bf16_lanepack_b128_spc8"),
                (BATCH, 8, "train_bf16_lanepack_spc8")):
            tstate = create_train_state(tdet, jax.random.PRNGKey(0), tx)
            tstep = make_train_step(tdet, steps_per_call=spc)
            tb = _train_batch(spc, tb_batch)
            step_s, (fl, by) = _time_train(tstep, tstate, tb, spc)
            PAYLOAD[f"{label}_ms_per_step"] = round(step_s * 1000.0, 2)
            PAYLOAD[f"{label}_img_s"] = round(tb_batch / step_s, 1)
            if tb_batch == 128:
                # XLA's cost model counts a scan/while BODY ONCE regardless
                # of trip count (verified empirically: flops('scan8 of
                # matmul') == flops('matmul')), so the compiled spc-step
                # program's (flops, bytes) ~= ONE step's — use directly
                # against the per-step time, do NOT divide by spc.
                PAYLOAD.update({f"train_b128_{k}": v for k, v in
                                _roofline(fl, by, step_s).items()})

    section("train_ssdlite", 260, s_train)

    # ---- second family: ssd300_vgg16 train step (VERDICT r3 item 4) —
    # the compute-bound MXU-heavy family where MFU is meaningful. bf16 is
    # the shipped config; the fp32 dtype-headroom row runs under --full
    # only (VERDICT r4 item 2: cut default wall-clock). --------------------
    def s_vgg(dtype, label):
        def run():
            from demonet_tpu.engine import (
                create_train_state, make_lr_schedule, make_optimizer,
                make_train_step)
            from demonet_tpu.models import ssd300_vgg16

            vdet = ssd300_vgg16(num_classes=91, dtype=dtype)
            tx = make_optimizer(make_lr_schedule(0.001, 100))
            vstate = create_train_state(vdet, jax.random.PRNGKey(0), tx)
            vspc, vb = 8, 32
            vstep = make_train_step(vdet, steps_per_call=vspc)
            batch = _train_batch(vspc, vb)
            # VGG input is 300x300: center-crop the 320 asset frames (the
            # GT boxes are only matcher fodder; shift by the crop offset)
            img = batch["images"][:, :, 10:310, 10:310, :]
            batch = dict(batch, images=img,
                         gt_boxes=jnp.clip(batch["gt_boxes"] - 10.0,
                                           0.0, 300.0))
            step_s, (fl, by) = _time_train(vstep, vstate, batch, vspc)
            PAYLOAD[f"{label}_ms_per_step"] = round(step_s * 1000.0, 2)
            PAYLOAD[f"{label}_img_s"] = round(vb / step_s, 1)
            # scan body counted once by the cost model — no /vspc (see the
            # train_b128 note above); dividing gave a phantom 8x MFU drop
            PAYLOAD.update({f"{label}_{k}": v for k, v in
                            _roofline(fl, by, step_s).items()})
        return run

    section("train_vgg_bf16", 180,
            s_vgg(jnp.bfloat16, "vgg300_train_bf16_b32"))
    if FULL:
        section("train_vgg_fp32", 180,
                s_vgg(jnp.float32, "vgg300_train_fp32_b32"))
    else:
        SKIPPED.append("train_vgg_fp32 (--full only)")
        emit()


if __name__ == "__main__":
    main()
