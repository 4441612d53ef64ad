"""Benchmark harness: ssdlite320_mobilenet_v3_large end-to-end inference
throughput (preproc -> backbone -> heads -> decode -> NMS, all on device).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Honesty notes:
  * Inputs are fixed-seed RANDOM images (zeros would give degenerate
    NMS/sort workloads), cycled across several distinct device buffers so
    neither XLA nor the device tunnel can cache a repeated call.
  * The timing barrier is a tiny device->host transfer of the last result
    (block_until_ready can return before remote execution completes on
    tunneled hosts — see STATUS.md).
  * vs_baseline: the reference (zhiqwang/demonet) publishes NO throughput
    numbers (BASELINE.json "published": {}), so there is no reference
    figure to normalize against. The ratio reported here is against THIS
    harness's first recorded run on the same class of device
    (.bench_baseline.json, committed: 1645.3 img/s at round 1's start) —
    i.e. self-progress, not a torch comparison.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 64
WARMUP = 3
ITERS = 20
N_BUFFERS = 4
BASELINE_FILE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")


def _sync(result) -> None:
    """Force completion: fetch one element to the host."""
    leaf = jax.tree_util.tree_leaves(result)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def main() -> None:
    from __graft_entry__ import entry

    fn, (variables, _) = entry()
    jf = jax.jit(fn)

    rng = np.random.default_rng(0)
    inputs = [jnp.asarray(rng.random((BATCH, 320, 320, 3), np.float32))
              for _ in range(N_BUFFERS)]
    jax.block_until_ready(inputs)

    _sync(jf(variables, inputs[0]))  # compile
    for i in range(WARMUP):
        out = jf(variables, inputs[i % N_BUFFERS])
    _sync(out)

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = jf(variables, inputs[i % N_BUFFERS])
    _sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    throughput = BATCH / dt

    # batch-1 latency: per-call blocking p50 (includes host/tunnel sync) and
    # pipelined (amortized device time per inference)
    inputs1 = [jnp.asarray(rng.random((1, 320, 320, 3), np.float32))
               for _ in range(N_BUFFERS)]
    _sync(jf(variables, inputs1[0]))
    lats = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        _sync(jf(variables, inputs1[i % N_BUFFERS]))
        lats.append(time.perf_counter() - t0)
    lats.sort()
    p50_ms = lats[len(lats) // 2] * 1000.0
    t0 = time.perf_counter()
    out1 = None
    for i in range(ITERS):
        out1 = jf(variables, inputs1[i % N_BUFFERS])
    _sync(out1)
    b1_pipelined_ms = (time.perf_counter() - t0) / ITERS * 1000.0

    # trained-weights serving numbers (VERDICT r2 weak #3): realistic
    # score sparsity — most (image, class) rows have no above-threshold
    # candidates, the regime the chunk-skipping top-k exploits. The asset
    # is the round-3 real-training checkpoint (tools/export_bench_weights.py).
    trained = {}
    trained_path = os.path.join(os.path.dirname(__file__), "bench_assets",
                                "ssdlite320_shapes_trained.npz")
    if os.path.exists(trained_path):
        from tools.export_bench_weights import load_bench_variables
        from demonet_tpu.models import ssdlite320_mobilenet_v3_large
        from demonet_tpu.models.detection import (
            postprocess_detections, preprocess)

        det = ssdlite320_mobilenet_v3_large(num_classes=91)
        tv = jax.device_put(load_bench_variables(trained_path))
        anchors = jnp.asarray(det.anchors)

        # real val frames (random noise under a trained model is all
        # background — unrealistically sparse); falls back to the random
        # buffers if the image asset is missing
        img_asset = os.path.join(os.path.dirname(__file__), "bench_assets",
                                 "val_images_320.npz")
        if os.path.exists(img_asset):
            from tools.export_bench_images import load_bench_images

            arr = load_bench_images(img_asset, BATCH * N_BUFFERS)
            t_inputs = [jnp.asarray(arr[i * BATCH:(i + 1) * BATCH])
                        for i in range(N_BUFFERS)]
            trained["trained_input"] = "real val frames (bench asset)"
        else:
            t_inputs = inputs
            trained["trained_input"] = "random (image asset missing)"

        def fwd(impl):
            def f(variables, images):
                x = preprocess(images, det.config, resize=False)
                out = det.model.apply(variables, x, train=False)
                return postprocess_detections(
                    out["cls_logits"], out["bbox_regression"], anchors,
                    det.config, impl=impl)
            return jax.jit(f)

        # "fused" = the trained-model fast path (per-image global select +
        # one class-offset NMS problem per image) with the count-proven
        # exact fallback — see models/detection._postprocess_fused
        for label, impl in (("trained_b64_img_s", "reference"),
                            ("trained_fused_b64_img_s", "fused")):
            f = fwd(impl)
            _sync(f(tv, t_inputs[0]))
            for i in range(WARMUP):
                out_t = f(tv, t_inputs[i % N_BUFFERS])
            _sync(out_t)
            t0 = time.perf_counter()
            for i in range(ITERS):
                out_t = f(tv, t_inputs[i % N_BUFFERS])
            _sync(out_t)
            trained[label] = round(
                BATCH / ((time.perf_counter() - t0) / ITERS), 2)
        trained["trained_weights"] = "round-3 shapes-corpus checkpoint "\
            "(real multi-epoch training run; see runs/ logs + TRAINRUN.md)"

    # training throughput, headline config: bf16 + lane-packed early trunk,
    # 8 optimizer steps per dispatch (engine/train.py steps_per_call —
    # amortizes per-step host dispatch; DESIGN.md "Multi-step dispatch")
    train = {}
    try:
        from demonet_tpu.engine import (
            create_train_state, make_lr_schedule, make_optimizer,
            make_train_step)
        from demonet_tpu.models import ssdlite320_mobilenet_v3_large

        tdet = ssdlite320_mobilenet_v3_large(
            num_classes=91, dtype=jnp.bfloat16, lane_pack=True)
        tx = make_optimizer(make_lr_schedule(0.02, 100))
        # b64 spc8: the round-3 config (cross-round continuity);
        # b128 spc4: the round-3 batch-scaling headline (DESIGN.md
        # "Batch scaling": bigger batches fill the chip better, b128 is
        # the measured sweet spot — b256 regresses)
        for tb_batch, spc, label in ((BATCH, 8, "train_bf16_lanepack_spc8"),
                                     (128, 4, "train_bf16_lanepack_b128_spc4")):
            tstate = create_train_state(tdet, jax.random.PRNGKey(0), tx)
            tstep = make_train_step(tdet, steps_per_call=spc)
            tb = {
                "images": jnp.asarray(
                    rng.random((spc, tb_batch, 320, 320, 3), np.float32)),
                "gt_boxes": jnp.tile(jnp.asarray(
                    [[[[20.0, 20.0, 120.0, 120.0]]]]), (spc, tb_batch, 1, 1)),
                "gt_labels": jnp.full((spc, tb_batch, 1), 1, jnp.int32),
                "gt_valid": jnp.ones((spc, tb_batch, 1), bool),
            }
            tstate, _ = tstep(tstate, tb)  # compile
            _sync(tstate.params)
            for _ in range(2):
                tstate, _ = tstep(tstate, tb)
            _sync(tstate.params)
            t0 = time.perf_counter()
            t_iters = 8
            for _ in range(t_iters):
                tstate, _ = tstep(tstate, tb)
            _sync(tstate.params)
            step_ms = (time.perf_counter() - t0) / (t_iters * spc) * 1000.0
            train[f"{label}_ms_per_step"] = round(step_ms, 2)
            train[f"{label}_img_s"] = round(tb_batch / step_ms * 1000.0, 1)
    except Exception as e:  # keep the bench line emitting on any failure
        train["train_bench_error"] = repr(e)[:200]

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        try:
            with open(BASELINE_FILE) as f:
                base = json.load(f)
            if base.get("value"):
                vs_baseline = throughput / float(base["value"])
        except Exception:
            pass
    else:
        try:
            with open(BASELINE_FILE, "w") as f:
                json.dump({"value": throughput, "unit": "images/sec/chip"}, f)
        except Exception:
            pass

    print(json.dumps({
        "metric": "ssdlite320_mobilenet_v3_large e2e inference throughput (b64)",
        "value": round(throughput, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
        "vs_baseline_meaning": "ratio vs this harness's first recorded run "
                               "(reference publishes no throughput numbers)",
        "p50_latency_b1_ms": round(p50_ms, 3),
        "b1_pipelined_ms": round(b1_pipelined_ms, 3),
        "batch": BATCH,
        "input": "fixed-seed random images",
        "device": str(jax.devices()[0]),
        **trained,
        **train,
    }))


if __name__ == "__main__":
    main()
