"""Max pooling with a dense-elementwise backward pass.

STATUS: built, proven bit-equal, measured on hardware, and NOT shipped —
a documented negative result (kept, like ops/fused_block.py and the
chunk-skip top-k, because the measurement is the finding). XLA
differentiates `reduce_window(max)` with a SelectAndScatter op that the
TPU backend runs at ~0.1 TFLOP/s — 3.6 ms of the 61 ms ssd300_vgg16 b32
bf16 train step (trace: tools/trace_op_stats.py). This module replaces
it with dense compare/cumsum work... which measured 87.0 ms vs 61.2 ms
for the SAME composed step (same-session A/B, 2026-08-19, identical
losses): the (B, Ho, k, Wo, k, C) view that makes the window math
elementwise is NOT free on TPU — H/W are tiled (sublane) dims, so the
reshape forces full-tensor retiling copies at 300x300x64 scale that
cost far more than the SelectAndScatter they replace. An earlier
strided-slice formulation of the same backward crashed the TPU worker
outright inside the composed program (kernel fault; fine standalone).
The stock path stays shipped (models/vgg.py::max_pool_torch); a Pallas
kernel reading x/out/g in native tiling is the only formulation left
that could win, bounded at ~2-3 ms of a 61 ms step.

For NON-OVERLAPPING pools (stride == kernel, the reference's pool1-4:
demonet/models/ssd_vgg16.py:33-39), each input cell belongs to exactly
one window, so the gradient is expressible with dense elementwise work:

    grad_in[cell] = g[window]  if cell holds the FIRST maximum of its
                                window (row-major scan order)
                    0          otherwise

"First maximum in scan order" is exactly XLA's SelectAndScatter winner
with the GE select autodiff builds (the running selection only moves on
a strictly-greater candidate), so the computed gradient is BIT-EQUAL to
the reduce_window VJP — verified element-exact against it in
tests/test_pool.py, engineered ties included. The forward pass IS
`lax.reduce_window` (not a reformulation), so forward numerics are
untouched by construction.

NaN caveat (documented divergence, unreachable in practice): a window
whose max is NaN propagates NaN through the forward either way, but this
backward drops its gradient (NaN == NaN is false) where SelectAndScatter
would route it to the first element; training aborts on non-finite loss
(engine/train.py) long before a NaN gradient matters.

NO caller routes through this module (it is a kept negative result):
models/vgg.py::max_pool_torch deliberately stays on the stock
reduce_window path for every pool. Were it ever revived, it applies
only when stride == kernel; overlapping pools (e.g. the SSD-modified
pool5, 3x3 stride 1) have no dense-elementwise formulation.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _reduce_window_max(x: jnp.ndarray, k: int,
                       pads: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, k, k, 1),
        padding=((0, 0), *pads, (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def max_pool_nonoverlap(x: jnp.ndarray, k: int,
                        pads: Tuple[Tuple[int, int], Tuple[int, int]]
                        ) -> jnp.ndarray:
    """NHWC max pool, window (k, k), stride (k, k), explicit (lo, hi) pads.

    Padded H and W must be divisible by k (ceil-mode padding as computed
    by models/vgg.py::max_pool_torch always satisfies this for s == k).
    """
    return _reduce_window_max(x, k, pads)


def _fwd(x, k, pads):
    out = _reduce_window_max(x, k, pads)
    return out, (x, out)


def _bwd(k, pads, res, g):
    x, out = res
    (plh, phh), (plw, phw) = pads
    neg = jnp.array(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (plh, phh), (plw, phw), (0, 0)),
                 constant_values=neg)
    b, hp, wp, c = xp.shape
    assert hp % k == 0 and wp % k == 0, (xp.shape, k)
    ho, wo = hp // k, wp // k
    # (B, Ho, k, Wo, k, C) is a PURE row-major reshape of the padded
    # input (C stays minor), so everything below is elementwise work
    # plus cumulative sums over the two size-k window axes — no strided
    # slices, no stacks, no SelectAndScatter. `before` counts window
    # cells equal to the max that precede (dh, dw) in row-major scan
    # order; the first max is the one with zero predecessors.
    xr = xp.reshape(b, ho, k, wo, k, c)
    eq = (xr == out[:, :, None, :, None, :]).astype(jnp.int32)
    in_row = jnp.cumsum(eq, axis=4) - eq           # earlier in same row
    row_tot = jnp.sum(eq, axis=4, keepdims=True)
    rows_before = jnp.cumsum(row_tot, axis=2) - row_tot
    first = (eq > 0) & (in_row + rows_before == 0)
    gp = jnp.where(first, g[:, :, None, :, None, :],
                   jnp.zeros((), g.dtype)).reshape(b, hp, wp, c)
    return (gp[:, plh:hp - phh, plw:wp - phw, :],)


max_pool_nonoverlap.defvjp(_fwd, _bwd)
