"""Lane-packed convolutions: W-adjacent pixels packed into the channel dim.

The early MobileNet trunk blocks are the training-step bottleneck (~25 ms
of the 53.7 ms fp32 b64 step, DESIGN.md "Training-step profile"): their
16-72 channels fill only 1/8..1/2 of the TPU's 128-wide vector lanes and
registers, so XLA's convs run HBM-bound at half bandwidth, and the
backward convs are worse. This module implements the "paired-pixel lane
layout" fix scoped in round 2 (DESIGN.md, ops/fused_block.py docstring) at
the XLA level rather than as a Pallas kernel:

  * pack p W-adjacent pixels into channels, PIXEL-MAJOR
    (lane = pixel_slot * C + c), so (B, H, W, C) -> (B, H, W/p, p*C) is a
    pure reshape and changing the pack factor is also a pure reshape;
  * 1x1 convs become kron(I_p, K) block-diagonal convs — the MXU does a
    128-wide pass regardless of K's width, so the "wasted" zero blocks are
    free while the lane fill goes from C/128 to p*C/128;
  * the 3x3 depthwise becomes a (3, 3) conv over (H, packed-W) whose
    kernel encodes the in-pack W-shifts (the lane-roll part of the
    paired-pixel design) — strides 1 and 2 both map onto pack-level
    stride with a 3-pack window.

Because everything stays a stock XLA conv, the round-2 failure mode
("breaks XLA's conv+BN+activation fusion", which made the 1x1-as-matmul
attempt 16% slower) does not apply, and the BACKWARD pass inherits the
same lane-filling layout through plain autodiff — no custom_vjp needed.

Numerics: bit-comparable to the unpacked convs up to XLA conv summation
order (same MXU precision either way); equivalence pinned in
tests/test_lane_pack.py, composed-train-step timings in
tools/check_packed_tpu.py and DESIGN.md.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def pack(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/p, p*C), pixel-major lanes."""
    if p == 1:
        return x
    b, h, w, c = x.shape
    assert w % p == 0, (w, p)
    return x.reshape(b, h, w // p, p * c)


def unpack(x: jnp.ndarray, p: int, c: int) -> jnp.ndarray:
    """(B, H, Wp, p*C) -> (B, H, Wp*p, C)."""
    if p == 1:
        return x
    b, h, wp, pc = x.shape
    assert pc == p * c, (pc, p, c)
    return x.reshape(b, h, wp * p, c)


def repack(x: jnp.ndarray, p_from: int, p_to: int, c: int) -> jnp.ndarray:
    """Change pack factor — a pure reshape thanks to pixel-major lanes."""
    if p_from == p_to:
        return x
    return pack(unpack(x, p_from, c), p_to)


def kron_1x1_kernel(kernel: jnp.ndarray, p: int) -> jnp.ndarray:
    """(1, 1, CI, CO) -> (1, 1, p*CI, p*CO) block-diagonal (per pixel slot)."""
    ci, co = kernel.shape[-2:]
    k2 = kernel.reshape(ci, co)
    big = jnp.einsum("pq,io->piqo", jnp.eye(p, dtype=kernel.dtype), k2)
    return big.reshape(1, 1, p * ci, p * co)


def packed_dw_kernel(kernel: jnp.ndarray, p: int, stride: int) -> jnp.ndarray:
    """Depthwise (KH, 3, 1, C) -> dense (KH, 3, p*C, p*C) over packed W.

    Output pixel slot j at pack J needs input pixel stride*(p*J + j) + dx;
    writing q = stride*j + dx, that input lives at pack stride*J + floor(q/p),
    slot q mod p — a 3-pack window (pad 1) at pack-level stride `stride`.
    """
    kh, kw, _, c = kernel.shape
    assert kw == 3, kw
    big = jnp.zeros((kh, 3, p * c, p * c), kernel.dtype)
    ar = jnp.arange(c)
    for j in range(p):
        for dx in (-1, 0, 1):
            q = stride * j + dx
            delta, j_in = q // p, q % p
            assert -1 <= delta <= 1, (p, stride, j, dx)
            for ky in range(kh):
                big = big.at[ky, delta + 1, j_in * c + ar, j * c + ar].set(
                    kernel[ky, dx + 1, 0, :])
    return big


def conv_1x1_packed(x: jnp.ndarray, kernel: jnp.ndarray, p: int) -> jnp.ndarray:
    """Packed x (B, H, Wp, p*CI) @ 1x1 kernel (1, 1, CI, CO)."""
    return jax.lax.conv_general_dilated(
        x, kron_1x1_kernel(kernel, p).astype(x.dtype),
        window_strides=(1, 1), padding="VALID", dimension_numbers=_DN)


def conv_dw_packed(x: jnp.ndarray, kernel: jnp.ndarray, p: int,
                   stride: int) -> jnp.ndarray:
    """Packed depthwise: x (B, H, Wp, p*C), kernel (KH, 3, 1, C).

    H keeps its pixel-level stride/padding; packed W uses stride `stride`
    with a fixed 3-pack window and 1-pack padding (zeros = the pixel-level
    W padding, since out-of-pack taps only reach adjacent packs).
    """
    kh = kernel.shape[0]
    ph = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        x, packed_dw_kernel(kernel, p, stride).astype(x.dtype),
        window_strides=(stride, stride),
        padding=((ph, ph), (1, 1)), dimension_numbers=_DN)


def packed_batch_stats(x: jnp.ndarray, p: int, c: int):
    """Per-TRUE-channel (mean, var) of packed activations — identical to the
    unpacked nn.BatchNorm batch statistics (every pixel counted once)."""
    b, h, wp, pc = x.shape
    v = x.reshape(b, h, wp, p, c)
    mean = jnp.mean(v, axis=(0, 1, 2, 3))
    var = jnp.mean(jnp.square(v), axis=(0, 1, 2, 3)) - jnp.square(mean)
    return mean, var


# ---------------------------------------------------------------------------
# Space-to-depth stem (the classic TPU "conv0" transform)
# ---------------------------------------------------------------------------


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, r*r*C), block-major channels
    ((u, v, c) flattened): pure relayout, no arithmetic."""
    b, h, w, c = x.shape
    assert h % r == 0 and w % r == 0, (h, w, r)
    x = x.reshape(b, h // r, r, w // r, r, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // r, w // r, r * r * c)


def s2d_stem_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a (3, 3, C, O) stride-2 conv kernel into the (2, 2, 4C, O)
    kernel that computes the SAME conv on space_to_depth(x, 2) with stride
    1 and padding ((1, 0), (1, 0)).

    Derivation: input position p = 2i + di - 1 (torch padding=1). Writing
    p = 2a + u (block a, in-block offset u): di=0 -> (a=i-1, u=1),
    di=1 -> (a=i, u=0), di=2 -> (a=i, u=1). So taps live at block offsets
    da in {-1, 0} = a 2-wide kernel with 1 step of LEFT padding, and the
    (kernel-step, in-block-offset) pair maps back to di; position
    (ka=0, u=0) is never read -> zero block. Why this wins on TPU: the
    3-channel stem input fills 3/128 vector lanes, so the conv runs at a
    fraction of HBM bandwidth; s2d presents 12 channels at half the
    spatial size — identical math (validated to fp32 noise), 4x lane fill.
    """
    kh, kw, c, o = k.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    k2 = jnp.zeros((2, 2, 2, 2, c, o), k.dtype)
    mapping = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
    for (ka, u), di in mapping.items():
        for (kb, v), dj in mapping.items():
            k2 = k2.at[ka, kb, u, v].set(k[di, dj])
    # (ka, kb, u, v, c, o) -> (ka, kb, (u, v, c), o): the (u, v, c)
    # flattening matches space_to_depth's channel order
    return k2.reshape(2, 2, 4 * c, o)


# ---------------------------------------------------------------------------
# Dense 3x3 convs over the packed-W layout (the VGG trunk's early block)
# ---------------------------------------------------------------------------


def packed_dense_kernel(kernel: jnp.ndarray, p: int,
                        stride: int = 1) -> jnp.ndarray:
    """Dense (KH, 3, CI, CO) -> (KH, 3, p*CI, p*CO) over packed W.

    Same mapping as packed_dw_kernel but with full channel-mixing blocks:
    output pixel slot j, W tap dx reads input pixel q = stride*j + dx,
    living at pack offset q // p, slot q % p — so block
    (da = q//p, j_in = q%p, j_out = j) carries the true (KH, CI, CO) tap
    kernel[:, dx + 1]. Distinct (j, dx) map to distinct blocks, all others
    stay zero: the MXU computes the zero blocks anyway (p-fold FLOP
    inflation of this layer) but the lane fill goes from CI/128, CO/128
    to p*CI/128, p*CO/128 — the trade DESIGN.md "Lane-packed VGG block 1"
    measures. Used for the C=64 VGG stage (demonet/models/ssd_vgg16.py:43,
    the reference's conv1_1/conv1_2 at 300x300).
    """
    kh, kw, ci, co = kernel.shape
    assert kw == 3, kw
    big = jnp.zeros((kh, 3, p * ci, p * co), kernel.dtype)
    for j in range(p):
        for dx in (-1, 0, 1):
            q = stride * j + dx
            da, j_in = q // p, q % p
            assert -1 <= da <= 1, (p, stride, j, dx)
            big = big.at[:, da + 1,
                         j_in * ci:(j_in + 1) * ci,
                         j * co:(j + 1) * co].set(kernel[:, dx + 1])
    return big


def conv_dense_packed(x: jnp.ndarray, kernel: jnp.ndarray, p: int,
                      stride: int = 1) -> jnp.ndarray:
    """Packed x (B, H, Wp, p*CI) @ dense 3x3 kernel (KH, 3, CI, CO).

    H keeps the pixel-level stride and same-padding; packed W uses a
    3-pack window at pack-level stride with 1-pack zero padding. The
    extra zero PIXEL that 1-pack padding implies beyond the true 1-pixel
    same-padding is never read: no (j, dx) tap maps to slot 0 of pack -1
    or slot p-1 of the last pack + 1 (see packed_dense_kernel's mapping).
    """
    kh = kernel.shape[0]
    ph = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        x, packed_dense_kernel(kernel, p, stride).astype(x.dtype),
        window_strides=(stride, stride),
        padding=((ph, ph), (1, 1)), dimension_numbers=_DN)


def packed_pool_2x2(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """2x2 stride-2 max pool on a p=2 packed map: (B, H, W/2, 2C) ->
    (B, H/2, W/2, C) — directly in the UNPACKED pixel layout, because each
    pack holds exactly one pool window's W extent.

    Slot max FIRST (ties -> left pixel via where), then the H pair via
    reduce_window: composed gradient routing is first-maximum in row-major
    scan order — identical to SelectAndScatter's on the 2x2 window, so the
    packed trunk trains with the same tie semantics as the standard one
    (pinned in tests/test_vgg_lane_pack.py). The W half is pure
    elementwise; only the cheap (2, 1) window keeps a SelectAndScatter
    backward.

    NaN caveat (documented divergence, same class as ops/pool.py's): the
    W-pair `where(a >= b)` picks the RIGHT pixel when the left is NaN
    (NaN >= x is false), so a NaN left-pixel activation is dropped where
    the standard path's lax.max would propagate it. jnp.maximum would
    propagate NaN but break the left-pixel tie routing the backward's
    SelectAndScatter-equality depends on. Unreachable in practice:
    training aborts on non-finite loss (engine/train.py) before a NaN
    activation matters, and the lane_pack=True trunk is a training knob.
    """
    b, h, wp, pc = x.shape
    assert pc == 2 * c and h % 2 == 0, (x.shape, c)
    a, bb = x[..., :c], x[..., c:]
    row = jnp.where(a >= bb, a, bb)
    return jax.lax.reduce_window(
        row, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        jax.lax.max, window_dimensions=(1, 2, 1, 1),
        window_strides=(1, 2, 1, 1), padding=((0, 0),) * 4)
