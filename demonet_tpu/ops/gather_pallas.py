"""Pallas TPU kernel: batched row-gather as exact one-hot matmuls.

Replaces XLA's scalar-expansion gather for the detection postprocess hot
spots (models/detection.py candidate + final gathers — measured 5.9 ms +
part of 4.6 ms at batch 64, ~30% of end-to-end inference; see DESIGN.md).

Idea: gathering R rows from an (N, D) table is (R, N) one-hot @ (N, D) —
MXU work instead of element-at-a-time address generation. Done naively the
one-hot costs O(R*N) VPU compares, which is as slow as the gather. The
two-level decomposition fixes it: split idx = hi*L + lo and reshape the
table to (L, H*D); then

    M[r]   = onehot_lo(r) @ T'      # (R, L) @ (L, H*D): picks row `lo`
                                    # of EVERY hi-segment at once
    out[r] = (M[r] * repeat(onehot_hi(r), D)) @ S   # select the segment;
                                    # S is the fixed (H*D, D) summing matrix

Both matmuls are selections: every output element is ONE table value plus
exact zeros. Exactness on the bf16 MXU is guaranteed by splitting the f32
table into three bf16 pieces with disjoint 8-bit significand ranges
(T = P1 + P2 + P3 exactly); each piece's product is exact (bf16 x {0,1}
-> f32) and the final f32 sums reassemble the original bits with no
rounding. A compiled-vs-jnp.take equality test pins this
(tests/test_gather_pallas.py, tools/check_gather_tpu.py on hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LO = 128  # low-radix: one-hot width (MXU contraction dim)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split3(t: jnp.ndarray):
    """f32 -> three bf16 pieces with disjoint significand ranges summing
    exactly back to t (standard exact f32-as-3xbf16 decomposition)."""
    p1 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(t, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32)
    r1 = t - p1
    p2 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(r1, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32)
    r2 = r1 - p2
    return (p1.astype(jnp.bfloat16), p2.astype(jnp.bfloat16),
            r2.astype(jnp.bfloat16))


def _gather_kernel(idx_ref, t1_ref, t2_ref, t3_ref, out_ref, *,
                   h: int, d: int, chunk: int):
    idx = idx_ref[0]  # (chunk, 1) int32
    lo = idx % _LO
    hi = idx // _LO
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, _LO), 1)
    onehot_lo = (lo == lo_iota).astype(jnp.bfloat16)
    hd = h * d
    acc = jnp.zeros((chunk, hd), jnp.float32)
    for t_ref in (t1_ref, t2_ref, t3_ref):
        acc = acc + jnp.dot(onehot_lo, t_ref[0],
                            preferred_element_type=jnp.float32)
    # segment select: repeat the hi one-hot D times along lanes
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, hd), 1) // d
    seg = (hi == hi_iota).astype(jnp.float32)
    masked = acc * seg
    # sum over the H segments: (chunk, H*D) @ (H*D, D) with a fixed 0/1
    # summing matrix — again one value + exact zeros per output
    col = jax.lax.broadcasted_iota(jnp.int32, (hd, d), 1)
    rowmod = jax.lax.broadcasted_iota(jnp.int32, (hd, d), 0) % d
    s = (col == rowmod).astype(jnp.bfloat16)
    m1, m2, m3 = _split3(masked)
    out = jnp.dot(m1, s, preferred_element_type=jnp.float32)
    out = out + jnp.dot(m2, s, preferred_element_type=jnp.float32)
    out = out + jnp.dot(m3, s, preferred_element_type=jnp.float32)
    out_ref[0] = out


def gather_rows_batch(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched exact row-gather: out[b, r] = table[b, idx[b, r]].

    Args:
      table: (B, N, D) float32 (D small, e.g. 4 box coords).
      idx: (B, R) int32 in [0, N).

    Returns (B, R, D) float32, bit-identical to jnp.take_along_axis.
    """
    b, n, d = table.shape
    _, r = idx.shape
    n_pad = _round_up(n, _LO)
    h = n_pad // _LO
    r_pad = _round_up(r, chunk)

    tp = jnp.zeros((b, n_pad, d), table.dtype).at[:, :n].set(table)
    # (B, N, D) -> (B, H, LO, D) -> (B, LO, H, D) -> (B, LO, H*D)
    tp = tp.reshape(b, h, _LO, d).transpose(0, 2, 1, 3).reshape(b, _LO, h * d)
    t1, t2, t3 = _split3(tp)
    idx_p = jnp.zeros((b, r_pad, 1), jnp.int32).at[:, :r, 0].set(
        idx.astype(jnp.int32))

    grid = (b, r_pad // chunk)
    kernel = functools.partial(_gather_kernel, h=h, d=d, chunk=chunk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LO, h * d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LO, h * d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LO, h * d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r_pad, d), jnp.float32),
        interpret=interpret,
    )(idx_p, t1, t2, t3)
    return out[:, :r]
