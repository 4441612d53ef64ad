"""Pallas TPU kernel: fused inverted-residual block (inference).

The train-step/forward profile (DESIGN.md "Training-step profile") shows
the early MobileNet blocks are HBM-bound: XLA materializes the expanded
(B, H, W, CE) maps (4x the block's input bytes) between the expand 1x1,
depthwise 3x3 and project 1x1 convs, because it does not fuse across
convolutions. This kernel runs the whole block — expand + BN + act,
dw 3x3 (stride 1/2) + BN + act, project + BN, optional residual — over
row tiles that stay in VMEM, so HBM sees only the block's input and
output. BN is inference-mode and folded into the conv weights/biases
(`fold_conv_bn`).

Eligibility: 3x3 depthwise, no squeeze-excite, relu/relu6/hswish — which
covers MobileNetV3's blocks 0-2 (the 160^2/80^2 hot ones) and every
MobileNetV2 block. Numerics match the unfused module to fp32 fusion
tolerance (BN folding reassociates one multiply); parity is pinned in
tests/test_fused_block.py and on hardware by tools/check_fused_tpu.py.

STATUS: experimental, NOT integrated. Two measured blockers on v5e
(tools/check_fused_tpu.py):
  1. SLOWER than XLA's unfused blocks in this formulation —
     channels-in-lanes under-fills the 128-wide registers at CE=16..72
     and the select-based dw shifting costs more VPU work than the HBM
     traffic it saves (28.6 ms vs 11.7 ms for blocks 0-2 at b64).
  2. compiled matmuls run at bf16 MXU precision even with
     precision=HIGHEST (uniform ~1e-3 rel error vs the fp32 module);
     exactness needs the explicit 3x-bf16 operand split of
     ops/gather_pallas._split3 applied to BOTH operands.
The known fixes: paired-pixel lane layout (2 pixels per lane row -> full
128 lanes, dw W-shifts become lane rolls) + explicit split matmuls. Kept,
with interpret-mode semantics tests, as the measured starting point for
that round-3 work; the unfused XLA path remains the production path.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_conv_bn(params: Dict, stats: Dict,
                 eps: float = 1e-3) -> Dict[str, jnp.ndarray]:
    """ConvBNAct params+stats -> folded {'kernel', 'bias'}.

    y = (conv(x) - mean) * scale/sqrt(var+eps) + bias
      = conv(x, k * s') + (bias - mean * s')        with s' per-channel.

    `eps` must match the block's BN: 1e-3 for the MobileNetV3 trunk
    (layers.py ConvBNAct default), 1e-5 for MobileNetV2 blocks
    (InvertedResidualV2 / the legacy extractor).
    """
    k = jnp.asarray(params["conv"]["kernel"], jnp.float32)
    scale = jnp.asarray(params["bn"]["scale"], jnp.float32)
    bias = jnp.asarray(params["bn"]["bias"], jnp.float32)
    mean = jnp.asarray(stats["bn"]["mean"], jnp.float32)
    var = jnp.asarray(stats["bn"]["var"], jnp.float32)
    s = scale * jax.lax.rsqrt(var + eps)
    return {"kernel": k * s, "bias": bias - mean * s}


def _act(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "relu":
        return jnp.maximum(x, 0.0)
    if kind == "relu6":
        return jnp.minimum(jnp.maximum(x, 0.0), 6.0)
    if kind == "hswish":
        return x * jnp.minimum(jnp.maximum(x + 3.0, 0.0), 6.0) * (1.0 / 6.0)
    raise ValueError(kind)


def _block_kernel(x_ref, we_ref, be_ref, wd_ref, bd_ref, wp_ref, bp_ref,
                  out_ref, *, th: int, w: int, ci: int, ce: int, co: int,
                  act: str, has_expand: bool, residual: bool,
                  h_total: int):
    """One (batch, row-tile) step, always at stride 1 — strided blocks are
    subsampled OUTSIDE the kernel (XLA slice), because every in-kernel
    even-index compaction (strided slice / lane-widening reshape / 3D
    gather) fails Mosaic legalization, while the extra stride-1 pixels are
    VPU-cheap and VMEM-resident.

    x block: (1, th + 2, w, ci) — the tile plus a 1-row halo each side;
    rows outside the image arrive zero-padded and are masked here.
    out block: (1, th, w, co).
    """
    i = pl.program_id(1)
    x = x_ref[0, 0]                                # (th+2, w, ci)
    s_in = (th + 2) * w
    x2 = x.reshape(s_in, ci)

    # rows of the halo'd tile that are real image rows
    row0 = i * th - 1                              # global row of tile row 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (s_in, 1), 0) // w + row0
    row_ok = (rows >= 0) & (rows < h_total)

    if has_expand:
        y = jnp.dot(x2, we_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        y = _act(y + be_ref[:], act)
    else:
        y = x2.astype(jnp.float32)
    y = jnp.where(row_ok, y, 0.0)                  # halo rows contribute 0

    # depthwise 3x3, pad 1: nine shifted multiply-adds on the flat
    # (s_in, ce) array; W-edge wraps masked by column index
    col = jax.lax.broadcasted_iota(jnp.int32, (s_in, 1), 0) % w
    s_out_rows = th * w
    acc = jnp.zeros((s_out_rows, ce), jnp.float32)
    wd = wd_ref[:]                                 # (9, ce) [dy*3+dx]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            start = (1 + dy) * w + dx
            # static slice of length th*w from the halo'd flat array
            if start < 0:
                term = jnp.concatenate(
                    [jnp.zeros((-start, ce), jnp.float32),
                     y[: s_out_rows + start]], axis=0)
            elif start + s_out_rows > s_in:
                over = start + s_out_rows - s_in
                term = jnp.concatenate(
                    [y[start:], jnp.zeros((over, ce), jnp.float32)], axis=0)
            else:
                term = y[start: start + s_out_rows]
            if dx == -1:
                term = jnp.where(col[:s_out_rows] > 0, term, 0.0)
            elif dx == 1:
                term = jnp.where(col[:s_out_rows] < w - 1, term, 0.0)
            acc = acc + term * wd[3 * (dy + 1) + (dx + 1)][None, :]
    acc = _act(acc + bd_ref[:], act)

    out = jnp.dot(acc, wp_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out = out + bp_ref[:]
    if residual:
        xc = x2[w: w + s_out_rows, :co]
        out = out + xc
    out_ref[0] = out.reshape(th, w, co)


def fused_inverted_residual(
    x: jnp.ndarray,
    expand: Optional[Dict[str, jnp.ndarray]],
    depthwise: Dict[str, jnp.ndarray],
    project: Dict[str, jnp.ndarray],
    stride: int = 1,
    act: str = "relu",
    row_tile: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inference forward of one inverted-residual block, fused in VMEM.

    Args:
      x: (B, H, W, CI) float32.
      expand: folded {'kernel': (1,1,CI,CE), 'bias': (CE,)} or None.
      depthwise: folded {'kernel': (3,3,1,CE), 'bias': (CE,)}.
      project: folded {'kernel': (1,1,CE,CO), 'bias': (CO,)}.
    """
    b, h, w, ci = x.shape
    if expand is not None:
        we = expand["kernel"].reshape(expand["kernel"].shape[-2:])
        ce = we.shape[1]
    else:
        we, ce = None, ci
    wd = depthwise["kernel"].reshape(9, ce)
    wp = project["kernel"].reshape(project["kernel"].shape[-2:])
    co = wp.shape[1]
    residual = stride == 1 and ci == co

    th = min(row_tile, h)
    while h % th:
        th -= 1
    n_tiles = h // th

    # halo'd input blocks: (th + 2) rows starting at i*th - 1; BlockSpec
    # index maps must land on block-multiples, so pass a pre-padded copy
    # shifted by +1 row and slice per tile via a plain blocked spec over a
    # (B, n_tiles, th+2, W, CI) gather — simplest correct form: build the
    # halo view with XLA (cheap, fused) and feed it as the input.
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    halo = jnp.stack(
        [xp[:, i * th: i * th + th + 2] for i in range(n_tiles)],
        axis=1)                                    # (B, n_tiles, th+2, W, CI)

    zero_e = jnp.zeros((1,), jnp.float32)
    args = [
        halo,
        we if we is not None else jnp.zeros((1, 1), jnp.float32),
        expand["bias"][None, :] if expand is not None else zero_e[None, :],
        wd,
        depthwise["bias"][None, :],
        wp,
        project["bias"][None, :],
    ]
    kernel = functools.partial(
        _block_kernel, th=th, w=w, ci=ci, ce=ce, co=co,
        act=act, has_expand=expand is not None, residual=residual,
        h_total=h)
    full = lambda *s: pl.BlockSpec(s, lambda i, j: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, th + 2, w, ci),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(*args[1].shape), full(*args[2].shape), full(*args[3].shape),
            full(*args[4].shape), full(*args[5].shape), full(*args[6].shape),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, co),
            lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), jnp.float32),
        interpret=interpret,
    )(*args)
    if stride == 2:
        out = out[:, ::2, ::2, :]
    return out
