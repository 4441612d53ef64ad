#!/usr/bin/env python
"""Summarize a jax.profiler trace (tools/profile_model.py output) into
per-op device-time attribution — the reproducible form of the xprof
numbers DESIGN.md cites.

Parses the Chrome-trace JSON the profiler writes next to the xplane
proto (tensorboard_plugin_profile's converter API is version-skewed in
this image, so we read trace.json.gz directly: the "XLA Ops" device
track carries per-op duration, hlo_category, model_flops and
bytes_accessed). Prints a category rollup with achieved TFLOP/s plus
the top ops, so "the early trunk costs X ms" is one command, not a
TensorBoard screenshot:

    python tools/profile_model.py --model ssd300_vgg16 --mode train \
        --batch-size 32 --bf16 --iters 5 --logdir /tmp/vggtrace
    python tools/trace_op_stats.py /tmp/vggtrace --iters 5 [--top 40]

CPU-only (pure JSON parsing; never touches the chip).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_device_events(logdir: str) -> list:
    paths = sorted(glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {logdir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    # device pid: process_name metadata "/device:TPU:N"; op track:
    # thread_name "XLA Ops"
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:" in e.get("args", {}).get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"
               and e["pid"] in dev_pids}
    return [e for e in ev if e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in op_tids]


def main(args) -> int:
    ev = load_device_events(args.logdir)
    if not ev:
        raise SystemExit("no XLA Ops events found")
    iters = args.iters
    total = sum(e["dur"] for e in ev)
    print(f"{len(ev)} device op events; device busy "
          f"{total / 1e3 / iters:.2f} ms/iter (over {iters} iters)")

    cats = collections.Counter()
    catflops = collections.Counter()
    for e in ev:
        a = e.get("args", {})
        c = a.get("hlo_category", "?")
        cats[c] += e["dur"]
        catflops[c] += int(a.get("model_flops") or 0)
    print("\nby hlo category:")
    for c, us in cats.most_common():
        if us / total < 0.002:
            continue
        fl = catflops[c] / iters
        tf = fl / (us / 1e6 / iters) / 1e12 if us else 0.0
        print(f"  {c:28s} {us / 1e3 / iters:8.3f} ms/iter "
              f"({100 * us / total:5.1f}%)  {fl / 1e9:9.1f} GFLOP  "
              f"{tf:6.1f} TFLOP/s")

    byop = collections.defaultdict(lambda: [0, 0, 0, ""])
    for e in ev:
        a = e.get("args", {})
        r = byop[e["name"]]
        r[0] += e["dur"]
        r[1] += int(a.get("model_flops") or 0)
        r[2] += 1
        if not r[3]:
            r[3] = a.get("long_name", "")
    print(f"\ntop {args.top} ops by device time:")
    for name, (us, fl, n, ln) in sorted(
            byop.items(), key=lambda kv: -kv[1][0])[:args.top]:
        tf = fl / (us / 1e6) / 1e12 if us else 0.0
        if len(ln) > 100:
            ln = ln[:97] + "..."
        print(f"  {us / 1e3 / iters:8.3f} ms ({100 * us / total:4.1f}%) "
              f"{tf:6.1f} TF/s x{n // iters:<3d} {name[:28]:28s} {ln}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--iters", type=int, default=5,
                   help="iterations captured inside the trace")
    sys.exit(main(p.parse_args()))
