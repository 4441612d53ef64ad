#!/usr/bin/env python
"""Compiled-kernel exactness check for ops/gather_pallas.py on real TPU:
asserts gather_rows_batch output is BIT-identical to jnp.take_along_axis
for the production shapes (candidate + final gathers), then reports the
speedup. Companion to tools/check_nms_tpu.py."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from demonet_tpu.ops.gather_pallas import gather_rows_batch  # noqa: E402


def flat_take(table, idx):
    b, n, d = table.shape
    flat = table.reshape(b * n, d)
    gi = (jnp.arange(b, dtype=idx.dtype)[:, None] * n + idx).reshape(-1)
    return jnp.take(flat, gi, axis=0).reshape(b, idx.shape[1], d)


def main() -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    cases = [
        ("candidate gather", 64, 3234, 4, 90 * 300),
        ("final gather", 64, 27000, 4, 300),
        ("adversarial values", 8, 511, 4, 777),
    ]
    jg = jax.jit(gather_rows_batch)
    jt = jax.jit(flat_take)
    ok = True
    for name, b, n, d, r in cases:
        vals = rng.random((b, n, d)).astype(np.float32) * 640 - 320
        vals[0, 0, :] = [1e30, -1e-30, 2.0 ** -20, 3.14159274]
        table = jnp.asarray(vals)
        idx = jnp.asarray(rng.integers(0, n, (b, r)), jnp.int32)
        got = jax.device_get(jg(table, idx))
        want = jax.device_get(jt(table, idx))
        same = bool((got == want).all())
        ok &= same
        print(f"{name}: bit-equal={same}")

        def timeit(f):
            for _ in range(3):
                out = f(table, idx)
            np.asarray(jax.device_get(out.ravel()[0]))
            t0 = time.perf_counter()
            for _ in range(20):
                out = f(table, idx)
            np.asarray(jax.device_get(out.ravel()[0]))
            return (time.perf_counter() - t0) / 20 * 1e3

        print(f"  pallas {timeit(jg):.2f} ms vs xla {timeit(jt):.2f} ms")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
