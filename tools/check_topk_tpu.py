#!/usr/bin/env python
"""Compiled-kernel exactness + perf check for ops/topk_pallas.py on real
TPU: asserts topk_sparse output is BIT-identical to lax.top_k on every
above-threshold entry (and -inf padding elsewhere) for production shapes
at trained-model sparsity, then reports the time vs the lax.top_k
baseline. Companion to check_nms_tpu.py / check_gather_tpu.py."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from demonet_tpu.ops.topk_pallas import (  # noqa: E402
    topk_sparse, topk_sparse_xla)

THRESH = 1e-3


def sparse_scores(rng, p, a, frac):
    base = (rng.random((p, a)).astype(np.float32)) * THRESH * 0.9
    n_hot = int(p * a * frac)
    pi = rng.integers(0, p, n_hot)
    ai = rng.integers(0, a, n_hot)
    base[pi, ai] = rng.random(n_hot).astype(np.float32) * 0.9 + THRESH * 2
    return base


def check_case(name, scores, k, slots, fn=topk_sparse):
    js = jax.jit(lambda s: fn(s, k, THRESH, slots=slots))
    jt = jax.jit(lambda s: jax.lax.top_k(s, k))
    s = jnp.asarray(scores)
    got_sc, got_idx = jax.device_get(js(s))
    want_sc, want_idx = jax.device_get(jt(s))
    live = want_sc > THRESH
    ok = bool((got_sc[live] == want_sc[live]).all()
              and (got_idx[live] == want_idx[live]).all())
    pad_ok = bool(np.all((got_sc[~live] == -np.inf)
                         | (got_sc[~live] <= THRESH)))
    in_range = bool((got_idx >= 0).all()
                    and (got_idx < scores.shape[-1]).all())
    print(f"{name}: live bit-equal={ok} padding_ok={pad_ok} "
          f"idx_in_range={in_range} live={int(live.sum())}")
    return ok and pad_ok and in_range


def bench(name, scores, k, slots, iters=30):
    jx = jax.jit(lambda s: topk_sparse_xla(s, k, THRESH, slots=slots))
    js = jax.jit(lambda s: topk_sparse(s, k, THRESH, slots=slots))
    jt = jax.jit(lambda s: jax.lax.top_k(s, k))
    bufs = [jnp.asarray(scores + i * 1e-9) for i in range(3)]
    for f, label in ((jx, "sparse_xla"), (js, "sparse_pallas"),
                     (jt, "lax.top_k")):
        out = f(bufs[0])
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(bufs[i % 3])
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name} {label}: {dt:.3f} ms")


def main() -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    b, c, a = 64, 90, 3234  # ssdlite320 production shape
    ok = True

    # trained-model sparsity: ~0.05% anchors above threshold
    tr = sparse_scores(rng, b * c, a, 0.0005).reshape(b, c, a)
    ok &= check_case("trained-sparsity (64,90,3234)", tr, 300, 8)
    ok &= check_case("trained-sparsity XLA variant", tr, 300, 8,
                     fn=topk_sparse_xla)

    # adversarial: exact ties across chunks, boundary values
    adv = np.zeros((8, 90, a), np.float32)
    adv[:, 3, [5, 200, 1390, 2600, 3233]] = 0.25
    adv[:, 3, 3000] = 0.5
    adv[:, 7, 128] = THRESH          # exactly at threshold: excluded
    adv[:, 7, 129] = np.nextafter(np.float32(THRESH), np.float32(1))
    ok &= check_case("adversarial ties/boundary", adv, 300, 8)
    ok &= check_case("adversarial ties/boundary XLA", adv, 300, 8,
                     fn=topk_sparse_xla)

    # dense scores: overflow -> fallback must be exact top_k everywhere
    dn = rng.random((4, 90, a)).astype(np.float32)
    js = jax.jit(lambda s: topk_sparse(s, 300, THRESH, slots=8))
    got = jax.device_get(js(jnp.asarray(dn)))
    want = jax.device_get(jax.jit(lambda s: jax.lax.top_k(s, 300))(jnp.asarray(dn)))
    dense_ok = bool((got[0] == want[0]).all() and (got[1] == want[1]).all())
    print(f"dense fallback: bit-equal={dense_ok}")
    ok &= dense_ok

    print("--- perf (b64 production shape) ---")
    bench("sparse scores", tr, 300, 8)
    bench("dense scores (fallback)",
          rng.random((b, c, a)).astype(np.float32), 300, 8)

    print("ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
