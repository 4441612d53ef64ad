"""Shared conv building blocks (flax.linen, NHWC, TPU-native).

Capability parity with the reference's block zoo:
  * make_divisible            (demonet/models/mobilenetv2.py:16-29)
  * Conv-BN-Activation        (demonet/models/mobilenetv2.py:32-59)
  * InvertedResidual (V2)     (demonet/models/mobilenetv2.py:62-100)
  * SqueezeExcitation         (demonet/models/mobilenetv3.py:22-40)
  * InvertedResidual (V3)     (demonet/models/mobilenetv3.py:61-99)
  * depthwise-separable conv  (demonet/models/box_head.py:24-34)

TPU-first choices: NHWC layout (XLA's native conv layout on TPU), explicit
torch-style symmetric padding (so converted torch checkpoints reproduce
bit-identical feature maps), a `dtype` knob for bfloat16 compute with fp32
params/BN statistics.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch Conv2d-style default init (kaiming fan_out, reference
# mobilenetv3.py:163-167) and the SSDLite detection init normal(0, 0.03)
# (reference ssd_mobilenetv3.py:57-62).
KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
NORMAL_003 = nn.initializers.normal(0.03)


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Round channel counts to a multiple of ``divisor`` (never down by >10%)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def hard_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return relu6(x + 3.0) / 6.0


def hard_swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * hard_sigmoid(x)


def _torch_padding(kernel_size: int, dilation: int = 1) -> Tuple[Tuple[int, int], ...]:
    """torch Conv2d's symmetric padding=(k-1)//2 * d, as an explicit flax pad."""
    p = (kernel_size - 1) // 2 * dilation
    return ((p, p), (p, p))


class _S2DConv3x3s2(nn.Module):
    """3x3 stride-2 conv computed on the space-to-depth input layout.

    Holds the SAME (3, 3, C, O) 'kernel' param a plain nn.Conv would (so
    checkpoints/converters are layout-agnostic) and rearranges it at trace
    time (ops/lane_pack.s2d_stem_kernel) — identical math, 4x the lane
    fill for the 3-channel stem."""

    features: int
    kernel_init: Callable
    dtype: Dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from demonet_tpu.ops.lane_pack import s2d_stem_kernel, space_to_depth

        c = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, c, self.features))
        k2 = s2d_stem_kernel(kernel.astype(self.dtype))
        return jax.lax.conv_general_dilated(
            space_to_depth(x.astype(self.dtype)), k2, (1, 1),
            ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvBNAct(nn.Module):
    """Conv2d (no bias) + BatchNorm + activation, NHWC.

    ``act`` None means linear (the V2 projection conv). ``groups`` equal to the
    input channel count gives a depthwise conv. ``s2d`` computes a 3x3
    stride-2 conv via space-to-depth (exact; stem lane-fill knob).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = relu6
    bn_eps: float = 1e-3
    bn_momentum: float = 0.99  # flax decay = 1 - torch momentum
    kernel_init: Callable = KAIMING_OUT
    dtype: Dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.s2d:
            assert (self.kernel_size, self.stride, self.groups,
                    self.dilation) == (3, 2, 1, 1), "s2d is a 3x3/s2 path"
            x = _S2DConv3x3s2(self.features, kernel_init=self.kernel_init,
                              dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=_torch_padding(self.kernel_size, self.dilation),
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=False,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class SqueezeExcitation(nn.Module):
    """SE block with hard-sigmoid gating (reference mobilenetv3.py:22-40)."""

    squeeze_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_channels, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(in_ch, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * hard_sigmoid(s)


class InvertedResidualV2(nn.Module):
    """MobileNetV2 inverted residual (reference mobilenetv2.py:62-100)."""

    features: int
    stride: int
    expand_ratio: int
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_res = self.stride == 1 and in_ch == self.features
        y = x
        idx = 0
        if self.expand_ratio != 1:
            y = ConvBNAct(hidden, 1, act=relu6, bn_eps=self.bn_eps,
                          bn_momentum=self.bn_momentum, dtype=self.dtype,
                          name=f"layers_{idx}")(y, train)
            idx += 1
        y = ConvBNAct(hidden, 3, stride=self.stride, groups=hidden, act=relu6,
                      bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                      dtype=self.dtype, name=f"layers_{idx}")(y, train)
        idx += 1
        y = ConvBNAct(self.features, 1, act=None, bn_eps=self.bn_eps,
                      bn_momentum=self.bn_momentum, dtype=self.dtype,
                      name=f"layers_{idx}")(y, train)
        return x + y if use_res else y


class InvertedResidualV3(nn.Module):
    """MobileNetV3 inverted residual with optional SE and hard-swish
    (reference mobilenetv3.py:61-99).

    The expand conv / depthwise / (SE) / project structure is kept as three
    named sub-blocks so SSDLite's C4 split ("run the expand 1x1 of the first
    block of the last stage, tap, then continue" — reference
    ssd_mobilenetv3.py:104-108) can be expressed by calling
    ``expand()`` and ``remainder()`` separately.
    """

    in_channels: int
    expanded_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    dilation: int = 1
    use_se: bool = False
    use_hs: bool = False
    bn_eps: float = 1e-3
    bn_momentum: float = 0.99
    dtype: Dtype = jnp.float32
    # lane packing (ops/lane_pack.py): >1 means this block's input arrives
    # packed at lane_pack_in and its convs run at lane_pack_run; output
    # leaves packed at lane_pack_run. Variable tree is identical either way.
    lane_pack_in: int = 1
    lane_pack_run: int = 1

    def setup(self):
        act = hard_swish if self.use_hs else nn.relu
        self._act = act
        self._has_expand = self.expanded_channels != self.in_channels
        packed = self.lane_pack_run > 1 or self.lane_pack_in > 1
        if packed:
            assert self.kernel_size == 3 and not self.use_se \
                and self.dilation == 1, "lane packing: 3x3 no-SE blocks only"
            p = self.lane_pack_run
            if self._has_expand:
                self.expand_conv = PackedConvBNAct(
                    self.expanded_channels, self.in_channels, 1, act=act,
                    bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                    dtype=self.dtype, pack=p)
            self.depthwise = PackedConvBNAct(
                self.expanded_channels, self.expanded_channels, 3,
                stride=self.stride, depthwise=True, act=act,
                bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                dtype=self.dtype, pack=p)
            self.project = PackedConvBNAct(
                self.out_channels, self.expanded_channels, 1, act=None,
                bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                dtype=self.dtype, pack=p)
            return
        if self._has_expand:
            self.expand_conv = ConvBNAct(
                self.expanded_channels, 1, act=act, bn_eps=self.bn_eps,
                bn_momentum=self.bn_momentum, dtype=self.dtype)
        stride = 1 if self.dilation > 1 else self.stride
        self.depthwise = ConvBNAct(
            self.expanded_channels, self.kernel_size, stride=stride,
            groups=self.expanded_channels, dilation=self.dilation, act=act,
            bn_eps=self.bn_eps, bn_momentum=self.bn_momentum, dtype=self.dtype)
        if self.use_se:
            self.se = SqueezeExcitation(
                make_divisible(self.expanded_channels // 4, 8), dtype=self.dtype)
        self.project = ConvBNAct(
            self.out_channels, 1, act=None, bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum, dtype=self.dtype)

    @property
    def use_res_connect(self) -> bool:
        return self.stride == 1 and self.in_channels == self.out_channels

    def expand(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """The expand 1x1 only — the SSDLite C4 tap point."""
        assert self.lane_pack_run == 1, "C4 tap block is never lane-packed"
        if self._has_expand:
            return self.expand_conv(x, train)
        return x

    def remainder(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Depthwise + SE + project (everything after the expand conv)."""
        y = self.depthwise(x, train)
        if self.use_se:
            y = self.se(y)
        return self.project(y, train)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.lane_pack_run > 1 or self.lane_pack_in > 1:
            from demonet_tpu.ops.lane_pack import repack

            x = repack(x, self.lane_pack_in, self.lane_pack_run,
                       self.in_channels)
            y = x
            if self._has_expand:
                y = self.expand_conv(y, train)
            y = self.depthwise(y, train)
            y = self.project(y, train)
            return x + y if self.use_res_connect else y
        y = self.remainder(self.expand(x, train), train)
        return x + y if self.use_res_connect else y


class SeparableConv(nn.Module):
    """Depthwise-separable conv block: 3x3 dw + BN + ReLU6 + 1x1 pw (with bias).

    The SSDLite prediction block (reference ssd_mobilenetv3.py:27-36 and the
    legacy SeperableConv2d, box_head.py:24-34).
    """

    features: int
    kernel_size: int = 3
    bn_eps: float = 1e-3
    bn_momentum: float = 0.97
    kernel_init: Callable = NORMAL_003
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = ConvBNAct(in_ch, self.kernel_size, groups=in_ch, act=relu6,
                      bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                      kernel_init=self.kernel_init, dtype=self.dtype,
                      name="dw")(x, train)
        x = nn.Conv(self.features, (1, 1), use_bias=True,
                    kernel_init=self.kernel_init, dtype=self.dtype,
                    name="pw")(x)
        return x


class _PackedConvKernel(nn.Module):
    """Declares nn.Conv's kernel param (same name/shape/init) for blocks
    whose compute runs in the lane-packed layout (ops/lane_pack.py)."""

    shape: Tuple[int, ...]
    init: Callable

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", self.init, self.shape, jnp.float32)


class _PackedBatchNorm(nn.Module):
    """nn.BatchNorm-compatible variables + semantics, computed on packed
    (B, H, Wp, p*C) activations with per-TRUE-channel statistics."""

    momentum: float
    epsilon: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, p: int, c: int,
                 use_running_average: bool) -> jnp.ndarray:
        from demonet_tpu.ops.lane_pack import packed_batch_stats

        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = packed_batch_stats(x.astype(jnp.float32), p, c)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        return (x * jnp.tile(mul, p).astype(x.dtype)
                + jnp.tile(add, p).astype(x.dtype))


class PackedConvBNAct(nn.Module):
    """ConvBNAct computed in the lane-packed layout (ops/lane_pack.py).

    Declares the IDENTICAL variable tree as ConvBNAct (conv/kernel,
    bn/{scale,bias} + batch_stats bn/{mean,var}) so checkpoints, weight
    converters, and exports are layout-agnostic. Supports exactly the
    shapes the packed trunk blocks need: 1x1 pointwise or 3x3 depthwise.
    """

    features: int
    in_features: int
    kernel_size: int = 1
    stride: int = 1
    depthwise: bool = False
    act: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None
    bn_eps: float = 1e-3
    bn_momentum: float = 0.99
    kernel_init: Callable = KAIMING_OUT
    dtype: Dtype = jnp.float32
    pack: int = 1

    def setup(self):
        if self.depthwise:
            assert self.kernel_size == 3 and self.features == self.in_features
            shape = (3, 3, 1, self.features)
        else:
            assert self.kernel_size == 1
            shape = (1, 1, self.in_features, self.features)
        self.conv = _PackedConvKernel(shape, self.kernel_init, name="conv")
        self.bn = _PackedBatchNorm(self.bn_momentum, self.bn_eps,
                                   self.dtype, name="bn")

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from demonet_tpu.ops.lane_pack import conv_1x1_packed, conv_dw_packed

        kernel = self.conv().astype(self.dtype)
        x = x.astype(self.dtype)
        if self.depthwise:
            x = conv_dw_packed(x, kernel, self.pack, self.stride)
        else:
            x = conv_1x1_packed(x, kernel, self.pack)
        x = self.bn(x, self.pack, self.features,
                    use_running_average=not train)
        if self.act is not None:
            x = self.act(x)
        return x
