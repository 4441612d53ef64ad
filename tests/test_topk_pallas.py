"""Chunk-skipping sparse top-k kernel (ops/topk_pallas.py): interpret-mode
exactness vs lax.top_k / the numpy oracle. Compiled-exactness on real TPU
is tools/check_topk_tpu.py (same pattern as the NMS/gather checks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demonet_tpu.ops.topk_pallas import (
    _bitonic_sort_desc, topk_sparse, topk_sparse_reference, topk_sparse_xla)


def _pallas(s, k, thresh, slots, **kw):
    return topk_sparse(s, k, thresh, slots=slots, interpret=True)


def _xla(s, k, thresh, slots, **kw):
    return topk_sparse_xla(s, k, thresh, slots=slots)


def _sparse_scores(rng, p, a, frac, thresh=1e-3):
    """Mostly-below-threshold scores with `frac` sparse spikes."""
    base = rng.random((p, a)).astype(np.float32) * thresh * 0.9
    n_hot = int(p * a * frac)
    if n_hot:
        pi = rng.integers(0, p, n_hot)
        ai = rng.integers(0, a, n_hot)
        base[pi, ai] = rng.random(n_hot).astype(np.float32) * 0.9 + thresh * 2
    return base


def test_bitonic_sort_desc_matches_numpy():
    rng = np.random.default_rng(0)
    key = rng.random((4, 256)).astype(np.float32)
    idx = rng.permutation(256).astype(np.int32)[None].repeat(4, 0)
    sk, si = jax.jit(_bitonic_sort_desc)(jnp.asarray(key), jnp.asarray(idx))
    order = np.argsort(-key, axis=1, kind="stable")
    np.testing.assert_array_equal(np.asarray(sk),
                                  np.take_along_axis(key, order, 1))
    np.testing.assert_array_equal(np.asarray(si),
                                  np.take_along_axis(idx, order, 1))


def test_bitonic_sort_tie_break_by_index():
    # equal keys: ascending index order (lax.top_k's tie rule)
    key = jnp.asarray([[1.0, 1.0, 1.0, 1.0, 0.5, 0.5, 2.0, 0.0]])
    idx = jnp.asarray([[3, 1, 0, 2, 7, 5, 6, 4]], jnp.int32)
    sk, si = _bitonic_sort_desc(key, idx)
    np.testing.assert_array_equal(
        np.asarray(si), [[6, 0, 1, 2, 3, 5, 7, 4]])
    np.testing.assert_array_equal(
        np.asarray(sk), [[2.0, 1.0, 1.0, 1.0, 1.0, 0.5, 0.5, 0.0]])


@pytest.mark.parametrize("impl", [_pallas, _xla])
@pytest.mark.parametrize("seed,frac", [(0, 0.001), (1, 0.01), (2, 0.0)])
def test_topk_sparse_matches_topk_above_threshold(seed, frac, impl):
    rng = np.random.default_rng(seed)
    thresh = 1e-3
    scores = _sparse_scores(rng, 24, 700, frac, thresh)
    k = 96
    sc, idx = jax.jit(
        lambda s: impl(s, k, thresh, slots=4)
    )(jnp.asarray(scores))
    sc, idx = np.asarray(sc), np.asarray(idx)
    ref_sc, ref_idx = topk_sparse_reference(scores, k, thresh)
    live = ref_sc > -np.inf
    np.testing.assert_array_equal(sc[live], ref_sc[live])
    np.testing.assert_array_equal(idx[live], ref_idx[live])
    # padding: -inf (sparse path) or the true below-threshold value
    # (overflow fallback = plain lax.top_k); always dead downstream
    pad = sc[~live]
    assert np.all((pad == -np.inf) | (pad <= thresh))
    assert (idx >= 0).all() and (idx < 700).all()
    # and the live prefix is bit-identical to lax.top_k
    t_sc, t_idx = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(sc[live], np.asarray(t_sc)[live])
    np.testing.assert_array_equal(idx[live], np.asarray(t_idx)[live])


@pytest.mark.parametrize("impl", [_pallas, _xla])
def test_topk_sparse_overflow_falls_back_to_dense(impl):
    """Dense scores (every chunk has candidates) -> overflow -> results are
    exactly lax.top_k, padding included."""
    rng = np.random.default_rng(3)
    scores = rng.random((10, 700)).astype(np.float32)  # all above 1e-3
    k = 64
    sc, idx = jax.jit(
        lambda s: impl(s, k, 1e-3, slots=2)
    )(jnp.asarray(scores))
    t_sc, t_idx = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(t_sc))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(t_idx))


@pytest.mark.parametrize("impl", [_pallas, _xla])
def test_topk_sparse_batched_shape(impl):
    rng = np.random.default_rng(4)
    scores = _sparse_scores(rng, 6 * 5, 300, 0.01).reshape(6, 5, 300)
    sc, idx = impl(jnp.asarray(scores), 32, 1e-3, slots=3)
    assert sc.shape == (6, 5, 32) and idx.shape == (6, 5, 32)
    ref_sc, _ = topk_sparse_reference(scores, 32, 1e-3)
    live = ref_sc > -np.inf
    np.testing.assert_array_equal(np.asarray(sc)[live], ref_sc[live])


@pytest.mark.parametrize("impl", [_pallas, _xla])
def test_topk_sparse_k_capacity_guard(impl):
    with pytest.raises(ValueError, match="capacity"):
        impl(jnp.zeros((4, 300)), 300, 1e-3, slots=2)


@pytest.mark.parametrize("impl", [_pallas, _xla])
def test_topk_sparse_exact_score_ties(impl):
    """Repeated identical scores across chunks: tie order = ascending
    anchor index, matching lax.top_k bit-for-bit."""
    scores = np.zeros((8, 512), np.float32)
    scores[:, [5, 200, 139, 260, 391]] = 0.25  # same value, several chunks
    scores[:, 300] = 0.5
    sc, idx = impl(jnp.asarray(scores), 8, 1e-3, slots=6)
    t_sc, t_idx = jax.lax.top_k(jnp.asarray(scores), 8)
    live = np.asarray(sc) > -np.inf
    np.testing.assert_array_equal(np.asarray(sc)[live],
                                  np.asarray(t_sc)[live])
    np.testing.assert_array_equal(np.asarray(idx)[live],
                                  np.asarray(t_idx)[live])
    assert live[:, :6].all() and not live[:, 6:].any()
