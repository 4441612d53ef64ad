#!/usr/bin/env python
"""Fused trained-model postprocess on real TPU: output equality with the
reference pipeline on the ROUND-3 TRAINED weights + real val frames
(bench assets), plus e2e b64 timings for both paths. Companion to
tests/test_postprocess_fused.py (CPU equality on synthetic cases)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    from tools.export_bench_images import load_bench_images
    from tools.export_bench_weights import load_bench_variables
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large
    from demonet_tpu.models.detection import (
        postprocess_detections, preprocess)

    det = ssdlite320_mobilenet_v3_large(num_classes=91)
    v = jax.device_put(load_bench_variables(
        "bench_assets/ssdlite320_shapes_trained.npz"))
    arr = load_bench_images("bench_assets/val_images_320.npz", 192)
    bufs = [jnp.asarray(arr[i * 64:(i + 1) * 64]) for i in range(3)]
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

    ok = True
    for i, buf in enumerate(bufs):
        ref = jax.device_get(jr(v, buf))
        fus = jax.device_get(jf(v, buf))
        val_eq = bool((ref["valid"] == fus["valid"]).all())
        m = ref["valid"]
        sc_eq = bool((ref["scores"][m] == fus["scores"][m]).all())
        lb_eq = bool((ref["labels"][m] == fus["labels"][m]).all())
        bx_close = bool(np.allclose(ref["boxes"][m], fus["boxes"][m],
                                    rtol=1e-5, atol=1e-3))
        n = int(m.sum())
        print(f"batch {i}: dets={n} valid_eq={val_eq} scores_eq={sc_eq} "
              f"labels_eq={lb_eq} boxes_close={bx_close}")
        ok &= val_eq and sc_eq and lb_eq and bx_close

    def _sync(out):
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(out)[0].ravel()[0]))

    print("--- e2e b64 timing (trained weights, real frames) ---")
    for f, label in ((jr, "reference"), (jf, "fused")):
        for i in range(3):
            out = f(v, bufs[i % 3])
        _sync(out)
        t0 = time.perf_counter()
        for i in range(20):
            out = f(v, bufs[i % 3])
        _sync(out)
        dt = (time.perf_counter() - t0) / 20 * 1000
        print(f"{label}: {dt:.2f} ms b64 ({64 / dt * 1000:.0f} img/s)")

    print("ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
