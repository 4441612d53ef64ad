#!/usr/bin/env python
"""Compiled check + timing for ops/fused_block.py on real TPU: numerics vs
the unfused flax blocks (eval mode) at production shapes, then speed."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from demonet_tpu.models.layers import InvertedResidualV3  # noqa: E402
from demonet_tpu.ops.fused_block import (  # noqa: E402
    fold_conv_bn, fused_inverted_residual)


def sync(r):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[0]))


def main() -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    B = 64
    # mnv3-large blocks 0-2 at 320^2 input (trunk after stem: 160^2 x 16)
    cases = [
        ("block0", 16, 16, 16, 1, 160),
        ("block1", 16, 64, 24, 2, 160),
        ("block2", 24, 72, 24, 1, 80),
    ]
    rng = np.random.default_rng(0)
    ok = True
    tot_fused = tot_xla = 0.0
    for name, ci, ce, co, stride, hw in cases:
        blk = InvertedResidualV3(ci, ce, co, 3, stride,
                                 use_se=False, use_hs=False)
        x = jnp.asarray(rng.normal(size=(B, hw, hw, ci)).astype(np.float32))
        variables = blk.init(jax.random.PRNGKey(0), x)
        p, s = variables["params"], variables["batch_stats"]
        expand = fold_conv_bn(p["expand_conv"], s["expand_conv"]) \
            if ce != ci else None
        dw = fold_conv_bn(p["depthwise"], s["depthwise"])
        pj = fold_conv_bn(p["project"], s["project"])

        jf = jax.jit(lambda x: fused_inverted_residual(
            x, expand, dw, pj, stride=stride, act="relu"))
        ju = jax.jit(lambda x: blk.apply(variables, x, train=False))
        got = jax.device_get(jf(x))
        want = jax.device_get(ju(x))
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        same = err < 1e-5
        ok &= bool(same)
        print(f"{name}: rel-err {err:.2e} ({'OK' if same else 'FAIL'})")

        def timeit(f):
            for _ in range(3):
                out = f(x)
            sync(out)
            t0 = time.perf_counter()
            for _ in range(20):
                out = f(x)
            sync(out)
            return (time.perf_counter() - t0) / 20 * 1e3

        tf, tu = timeit(jf), timeit(ju)
        tot_fused += tf
        tot_xla += tu
        print(f"  fused {tf:.2f} ms vs xla {tu:.2f} ms  ({tu / tf:.2f}x)")
    print(f"TOTAL blocks 0-2: fused {tot_fused:.2f} ms vs xla "
          f"{tot_xla:.2f} ms")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
