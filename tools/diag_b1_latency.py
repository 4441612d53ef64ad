#!/usr/bin/env python
"""Batch-1 blocking-latency breakdown on the real chip (VERDICT r3 item 7).

BENCH_r03 measured 31.9 ms blocking vs 3.16 ms pipelined at b1 — a 10x
gap attributed to the tunneled host runtime. This tool splits a blocking
call into its serial components so the gap is accounted for, not guessed:

  rtt          — tunnel round trip: trivial jitted op on a (8,) array,
                 blocking p50 (dispatch + execute-nothing + D2H sync)
  h2d_f32/u8   — jax.device_put of the b1 image (float32 1.2 MB / uint8
                 0.3 MB), blocked
  d2h          — fetch one element of an already-computed device result
  compute      — pipelined amortized time (device occupancy per call)
  e2e_host     — blocking p50 with the HOST numpy array as input
                 (device_put inside the timed region — the serving shape)
  e2e_device   — blocking p50 with inputs already on device
  e2e_u8       — blocking p50, uint8 host input (u8 preprocess path)
  e2e_donate   — e2e_device with the input buffer donated

The printed model: e2e_host ~= h2d + dispatch/queue + compute + d2h;
whatever e2e_device minus (rtt + compute) leaves is per-call runtime
overhead the host Python + PJRT client adds at b1. The C++ PJRT runner
(cpp/pjrt_runner, 23.1 ms p50 on the same artifact) bounds how much of
that is Python vs tunnel.

Usage:  python tools/diag_b1_latency.py [--iters 40]
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


def _p50(samples):
    s = sorted(samples)
    return s[len(s) // 2] * 1000.0


def _bench(fn, iters, *, warmup=5):
    for _ in range(warmup):
        fn()
    lats = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        lats.append(time.perf_counter() - t0)
    return _p50(lats)


def main(args) -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large
    from demonet_tpu.models.detection import (
        postprocess_detections, preprocess)

    det = ssdlite320_mobilenet_v3_large(num_classes=91)
    variables = jax.device_put(det.init(jax.random.PRNGKey(0)))
    anchors = jnp.asarray(det.anchors)
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    n_bufs = 4
    host_f32 = [rng.random((1, 320, 320, 3), np.float32)
                for _ in range(n_bufs)]
    host_u8 = [(x * 255).astype(np.uint8) for x in host_f32]
    dev_f32 = [jax.device_put(x, dev) for x in host_f32]
    jax.block_until_ready(dev_f32)

    def fwd(donate=False):
        def f(variables, images):
            x = preprocess(images, det.config, resize=False)
            out = det.model.apply(variables, x, train=False)
            return postprocess_detections(
                out["cls_logits"], out["bbox_regression"], anchors,
                det.config)
        return jax.jit(f, donate_argnums=(1,) if donate else ())

    jf = fwd()
    jd = fwd(donate=True)

    def sync(out):
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(out)[0].ravel()[0]))

    it = args.iters
    res = {}

    # tunnel round trip floor
    tiny = jax.device_put(jnp.zeros((8,), jnp.float32), dev)
    jtiny = jax.jit(lambda x: x + 1.0)
    sync(jtiny(tiny))
    res["rtt_ms"] = _bench(lambda: sync(jtiny(tiny)), it)

    # H2D transfer, blocked
    i = [0]

    def h2d(pool):
        def go():
            x = jax.device_put(pool[i[0] % n_bufs], dev)
            x.block_until_ready()
            i[0] += 1
        return go
    res["h2d_f32_ms"] = _bench(h2d(host_f32), it)
    res["h2d_u8_ms"] = _bench(h2d(host_u8), it)

    # D2H of one element of a resident result
    out0 = jf(variables, dev_f32[0])
    jax.block_until_ready(out0)
    res["d2h_ms"] = _bench(lambda: sync(out0), it)

    # pipelined device occupancy
    sync(jf(variables, dev_f32[0]))
    for k in range(3):
        out = jf(variables, dev_f32[k % n_bufs])
    sync(out)
    t0 = time.perf_counter()
    for k in range(it):
        out = jf(variables, dev_f32[k % n_bufs])
    sync(out)
    res["compute_pipelined_ms"] = (time.perf_counter() - t0) / it * 1000.0

    # end-to-end blocking variants
    def e2e_host():
        k = i[0] % n_bufs
        i[0] += 1
        sync(jf(variables, host_f32[k]))
    res["e2e_host_ms"] = _bench(e2e_host, it)

    def e2e_device():
        k = i[0] % n_bufs
        i[0] += 1
        sync(jf(variables, dev_f32[k]))
    res["e2e_device_ms"] = _bench(e2e_device, it)

    # uint8 host input (quarter-size H2D; device-side rescale)
    u8det = ssdlite320_mobilenet_v3_large(num_classes=91)

    def fu8(variables, images):
        x = preprocess(images.astype(jnp.float32) / 255.0, u8det.config,
                       resize=False)
        out = u8det.model.apply(variables, x, train=False)
        return postprocess_detections(
            out["cls_logits"], out["bbox_regression"], anchors,
            u8det.config)
    ju8 = jax.jit(fu8)
    sync(ju8(variables, host_u8[0]))

    def e2e_u8():
        k = i[0] % n_bufs
        i[0] += 1
        sync(ju8(variables, host_u8[k]))
    res["e2e_u8_host_ms"] = _bench(e2e_u8, it)

    # donated resident input (buffer reuse on device)
    def e2e_donate():
        x = jax.device_put(host_f32[i[0] % n_bufs], dev)
        i[0] += 1
        sync(jd(variables, x))
    res["e2e_donate_ms"] = _bench(e2e_donate, it)

    for k, v in res.items():
        print(f"{k:24s} {v:8.2f}")
    unacct = res["e2e_device_ms"] - res["rtt_ms"] \
        - res["compute_pipelined_ms"]
    print(f"{'unaccounted (e2e_device - rtt - compute)':41s} {unacct:8.2f}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=40)
    sys.exit(main(p.parse_args()))
