"""Benchmark harness: ssdlite320_mobilenet_v3_large end-to-end inference
throughput (preproc -> backbone -> heads -> decode -> NMS, all on device).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline: the reference publishes no throughput numbers
(BASELINE.json "published": {}); the comparison anchor used here is the
reference's torch/CPU-GPU stack measured equivalently when available —
absent that, vs_baseline is reported as the ratio against the first recorded
run of this harness (self-baseline, stored in .bench_baseline.json).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BATCH = 64
WARMUP = 3
ITERS = 20
BASELINE_FILE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")


def main() -> None:
    from __graft_entry__ import entry

    fn, (variables, _) = entry()
    jf = jax.jit(fn)

    images = jnp.zeros((BATCH, 320, 320, 3), jnp.float32)
    # compile
    jax.block_until_ready(jf(variables, images))
    for _ in range(WARMUP):
        out = jf(variables, images)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jf(variables, images)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    throughput = BATCH / dt

    # batch-1 latency: per-call blocking p50 (includes host/tunnel sync) and
    # pipelined (amortized device time per inference)
    images1 = jnp.zeros((1, 320, 320, 3), jnp.float32)
    jax.block_until_ready(jf(variables, images1))
    lats = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(variables, images1))
        lats.append(time.perf_counter() - t0)
    lats.sort()
    p50_ms = lats[len(lats) // 2] * 1000.0
    t0 = time.perf_counter()
    out1 = None
    for _ in range(ITERS):
        out1 = jf(variables, images1)
    jax.block_until_ready(out1)
    b1_pipelined_ms = (time.perf_counter() - t0) / ITERS * 1000.0

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
        "p50_latency_b1_ms": round(p50_ms, 3),
        "b1_pipelined_ms": round(b1_pipelined_ms, 3),
        "batch": BATCH,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
