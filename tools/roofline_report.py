#!/usr/bin/env python
"""Analytic per-layer roofline report: how fast COULD this model go.

The absolute-accountability companion to bench.py's achieved TFLOP/s //
HBM GB/s numbers (VERDICT r3 weak #2): walks every leaf module with
flax's per-module flop accounting and prints, per layer and in total,
the minimum time the chip's two hard limits allow:

  mxu_ms  = flops / peak_flops        (MXU limit)
  hbm_ms  = bytes / peak_bandwidth    (HBM limit)
  min_ms  = max(mxu_ms, hbm_ms)       (roofline floor for that layer)

Two byte models bracket reality:
  * unfused: every layer reads its inputs and writes its outputs from/to
    HBM (upper bound on traffic — XLA fuses much of this away);
  * fused floor: every activation is written once and read once in the
    whole network, weights read once (what perfect fusion would leave).

Totals are printed for both, next to --measured (a bench number) when
given, so "X ms is the floor" is a computed claim, not prose. FLOPs come
from flax.linen.summary (jax.jit cost analysis on each submodule);
backward (`--mode train`) uses its vjp flop count and approximates bytes
as 3x forward (read act + grad, write grad — the standard heuristic).

CPU-safe (pure analysis, no device work):
    python tools/roofline_report.py --model ssdlite320_mobilenet_v3_large \
        --batch 128 --dtype bf16 --mode train --measured 39.58
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")  # analysis only, never the chip

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# public peaks (same table as bench.py): v5e
PEAK_FLOPS = {"bf16": 197e12, "fp32": 197e12}  # MXU is bf16-native; fp32
#             programs are held to the same peak so the dtype headroom shows
PEAK_BW = 819e9
DTYPE_BYTES = {"bf16": 2, "fp32": 4}


def _nbytes(tree, bytes_per_el):
    return sum(int(np.prod(x.shape)) * bytes_per_el
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


def main(args) -> int:
    from flax.linen import summary as fsum

    from demonet_tpu.models import get_model

    det = get_model(args.model, num_classes=args.num_classes)
    h, w = det.config.size
    x = jnp.zeros((args.batch, h, w, 3), jnp.float32)
    tab = fsum._get_module_table(
        det.model, depth=None, show_repeated=True,
        compute_flops=True, compute_vjp_flops=(args.mode == "train"))
    rows = tab(jax.random.PRNGKey(0), x, train=False)

    paths = [r.path for r in rows]
    leaves = [r for r in rows
              if r.path and not any(p != r.path and p[:len(r.path)] == r.path
                                    for p in paths)]
    bpe = DTYPE_BYTES[args.dtype]
    peak_f = PEAK_FLOPS[args.dtype]

    records = []
    total_out_bytes = 0
    total_param_bytes = 0
    for r in leaves:
        flops = float(r.flops or 0)
        if args.mode == "train":
            flops += float(r.vjp_flops or 0)
        in_b = _nbytes(r.inputs, bpe)
        out_b = _nbytes(r.outputs, bpe)
        par_b = _nbytes(
            jax.tree_util.tree_leaves(r.module_variables), bpe)
        unfused_b = in_b + out_b + par_b
        if args.mode == "train":
            unfused_b *= 3  # fwd act + bwd grad traffic heuristic
        mxu_ms = flops / peak_f * 1e3
        hbm_ms = unfused_b / PEAK_BW * 1e3
        records.append({
            "path": "/".join(r.path),
            "type": type(r.module_copy).__name__,
            "flops": flops, "bytes": unfused_b,
            "mxu_ms": mxu_ms, "hbm_ms": hbm_ms,
            "min_ms": max(mxu_ms, hbm_ms),
        })
        total_out_bytes += out_b
        total_param_bytes += par_b

    flops_total = sum(rec["flops"] for rec in records)
    unfused_bytes = sum(rec["bytes"] for rec in records)
    # fused floor: each activation written + read once, input read, params
    # read once
    fused_bytes = (2 * total_out_bytes + _nbytes([x], bpe)
                   + total_param_bytes)
    if args.mode == "train":
        fused_bytes *= 3

    mxu_total = flops_total / peak_f * 1e3
    hbm_unfused = unfused_bytes / PEAK_BW * 1e3
    hbm_fused = fused_bytes / PEAK_BW * 1e3

    records.sort(key=lambda rec: -rec["min_ms"])
    print(f"model={args.model} batch={args.batch} dtype={args.dtype} "
          f"mode={args.mode}  ({len(records)} leaf modules)")
    print(f"{'layer':58s} {'type':10s} {'GFLOP':>8s} {'MB':>8s} "
          f"{'mxu_ms':>8s} {'hbm_ms':>8s} {'min_ms':>8s}")
    for rec in records[:args.top]:
        print(f"{rec['path'][:58]:58s} {rec['type'][:10]:10s} "
              f"{rec['flops'] / 1e9:8.2f} {rec['bytes'] / 1e6:8.1f} "
              f"{rec['mxu_ms']:8.3f} {rec['hbm_ms']:8.3f} "
              f"{rec['min_ms']:8.3f}")
    print("-" * 112)
    per_layer_floor = sum(rec["min_ms"] for rec in records)
    print(f"totals: {flops_total / 1e9:.1f} GFLOP  "
          f"unfused {unfused_bytes / 1e6:.0f} MB / "
          f"fused-floor {fused_bytes / 1e6:.0f} MB")
    print(f"MXU-limit {mxu_total:.2f} ms | HBM-limit unfused "
          f"{hbm_unfused:.2f} ms, fused-floor {hbm_fused:.2f} ms | "
          f"per-layer roofline sum {per_layer_floor:.2f} ms")
    floor = max(mxu_total, hbm_fused)
    print(f"speed-of-light floor (max of MXU, fused HBM): {floor:.2f} ms")
    if args.measured:
        print(f"measured {args.measured:.2f} ms = {args.measured / floor:.2f}x "
              f"floor ({100 * floor / args.measured:.0f}% of "
              "speed-of-light)")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ssdlite320_mobilenet_v3_large")
    p.add_argument("--num-classes", type=int, default=91)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", choices=("bf16", "fp32"), default="bf16")
    p.add_argument("--mode", choices=("infer", "train"), default="infer")
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--measured", type=float, default=None,
                   help="a bench.py/bench_train.py number to compare")
    sys.exit(main(p.parse_args()))
