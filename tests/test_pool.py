"""ops/pool.max_pool_nonoverlap: forward and gradient exactness vs the
standard `reduce_window` max pool (whose VJP is XLA's SelectAndScatter).

The custom backward must be BIT-EQUAL to the standard one — including on
engineered ties, where both route the gradient to the FIRST maximum of
the window in row-major scan order — so swapping it into the VGG/Pelee
trunks (models/vgg.py::max_pool_torch) cannot change training numerics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from demonet_tpu.ops.pool import max_pool_nonoverlap


def _std_pool(x, k, pads):
    return nn.max_pool(x, (k, k), strides=(k, k), padding=pads)


def _pads(dim, k, padding, ceil_mode):
    lo, hi = padding, padding
    if ceil_mode:
        rem = (dim + 2 * padding - k) % k
        if rem != 0:
            hi += k - rem
    return (lo, hi)


CASES = [
    # (H, W, k, padding, ceil_mode) — the shapes the models actually use
    (300, 300, 2, 0, False),   # vgg pool1 (and 150/75 downstream)
    (75, 76, 2, 0, True),      # vgg pool3: ceil_mode, odd H -> hi pad
    (8, 6, 2, 0, True),
    (9, 7, 3, 0, True),        # k=3 non-overlap with ceil padding
    (12, 12, 2, 1, False),     # symmetric padding
]


@pytest.mark.parametrize("h,w,k,padding,ceil_mode", CASES)
def test_forward_and_grad_bit_equal(h, w, k, padding, ceil_mode):
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.normal(size=(2, h, w, 5)).astype(np.float32))
    pads = (_pads(h, k, padding, ceil_mode), _pads(w, k, padding, ceil_mode))

    out_new = max_pool_nonoverlap(x, k, pads)
    out_std = _std_pool(x, k, list(pads))
    assert np.array_equal(np.asarray(out_new), np.asarray(out_std))

    # weight the windows so every output cell has a distinct cotangent
    wts = jnp.asarray(
        rng.normal(size=out_std.shape).astype(np.float32))
    g_new = jax.grad(lambda t: jnp.sum(max_pool_nonoverlap(t, k, pads) * wts))(x)
    g_std = jax.grad(lambda t: jnp.sum(_std_pool(t, k, list(pads)) * wts))(x)
    assert np.array_equal(np.asarray(g_new), np.asarray(g_std))


def test_tie_break_matches_select_and_scatter():
    """Engineered ties: every window holds duplicated maxima; both impls
    must send the gradient to the FIRST max in row-major window order."""
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, size=(3, 8, 8, 4)).astype(np.float32)
    x = jnp.asarray(base)  # small int values -> many exact ties
    pads = ((0, 0), (0, 0))
    wts = jnp.asarray(rng.normal(size=(3, 4, 4, 4)).astype(np.float32))
    g_new = jax.grad(lambda t: jnp.sum(max_pool_nonoverlap(t, 2, pads) * wts))(x)
    g_std = jax.grad(lambda t: jnp.sum(_std_pool(t, 2, list(pads)) * wts))(x)
    assert np.array_equal(np.asarray(g_new), np.asarray(g_std))
    # sanity: ties really occurred (some window has >1 cell equal to max)
    out = np.asarray(_std_pool(x, 2, list(pads)))
    eq_counts = sum(
        (base[:, dh::2, dw::2, :] == out).sum()
        for dh in range(2) for dw in range(2))
    assert eq_counts > out.size  # more equal cells than windows -> ties


def test_fuzz_grad_bit_equal():
    rng = np.random.default_rng(7)
    for _ in range(10):
        h = int(rng.integers(3, 22))
        w = int(rng.integers(3, 22))
        k = int(rng.integers(2, 4))
        ceil_mode = bool(rng.integers(0, 2))
        if not ceil_mode and (h % k or w % k):
            ceil_mode = True
        # quantized values force frequent ties
        x = jnp.asarray(
            (rng.integers(-3, 4, size=(2, h, w, 3)) * 0.5).astype(np.float32))
        pads = (_pads(h, k, 0, ceil_mode), _pads(w, k, 0, ceil_mode))
        wts_shape = jax.eval_shape(
            lambda t: max_pool_nonoverlap(t, k, pads), x).shape
        wts = jnp.asarray(rng.normal(size=wts_shape).astype(np.float32))
        g_new = jax.grad(
            lambda t: jnp.sum(max_pool_nonoverlap(t, k, pads) * wts))(x)
        g_std = jax.grad(
            lambda t: jnp.sum(_std_pool(t, k, list(pads)) * wts))(x)
        assert np.array_equal(np.asarray(g_new), np.asarray(g_std)), (
            h, w, k, ceil_mode)


def test_bf16_and_jit():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 8))).astype(jnp.bfloat16)
    pads = ((0, 0), (0, 0))
    f_new = jax.jit(lambda t: jax.grad(
        lambda u: jnp.sum(max_pool_nonoverlap(u, 2, pads)
                          .astype(jnp.float32)))(t))
    f_std = jax.jit(lambda t: jax.grad(
        lambda u: jnp.sum(_std_pool(u, 2, list(pads))
                          .astype(jnp.float32)))(t))
    assert np.array_equal(np.asarray(f_new(x)), np.asarray(f_std(x)))


def test_vgg_trunk_grad_unchanged():
    """Swapping the unshipped fast backward into the ssd300 extractor
    would leave every parameter gradient bit-identical to the shipped
    standard-pool build — the exactness half of the ops/pool.py negative
    result (the composed-speed half is why it is NOT shipped)."""
    from demonet_tpu.models.vgg import VGG16SSDExtractor
    import demonet_tpu.models.vgg as vggmod

    ext = VGG16SSDExtractor()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 96, 96, 3)).astype(np.float32))
    variables = ext.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params, pool_fn):
        orig = vggmod.max_pool_torch
        vggmod.max_pool_torch = pool_fn
        try:
            feats = ext.apply({"params": params}, x, train=False)
        finally:
            vggmod.max_pool_torch = orig
        return sum(jnp.sum(f.astype(jnp.float32) ** 2) for f in feats)

    shipped_pool_torch = vggmod.max_pool_torch

    def fast_pool_torch(t, k, s, padding=0, ceil_mode=False):
        if s == k:
            pads = tuple(_pads(d, k, padding, ceil_mode)
                         for d in t.shape[1:3])
            return max_pool_nonoverlap(t, k, pads)
        return shipped_pool_torch(
            t, k, s, padding=padding, ceil_mode=ceil_mode)

    g_new = jax.grad(loss)(variables["params"], fast_pool_torch)
    g_std = jax.grad(loss)(variables["params"], shipped_pool_torch)
    flat_new = jax.tree_util.tree_leaves(g_new)
    flat_std = jax.tree_util.tree_leaves(g_std)
    for a, b in zip(flat_new, flat_std):
        assert np.array_equal(np.asarray(a), np.asarray(b))
