"""Multi-scale feature extractors that feed the SSD heads.

Two families, capability parity with the reference:
  * `SSDLiteMobileNetExtractor` — MobileNetV3 (large/small) with the C4 split
    and 4 SSDLite extra blocks 512/256/256/128
    (reference demonet/models/ssd_mobilenetv3.py:98-133).
  * `MobileNetV2ExtraBlocks` — the legacy v0 extractor: MobileNetV2 taps at
    blocks 13 & 18 plus 4 inverted-residual extra blocks 512/256/256/64
    (reference demonet/models/backbone.py:45-78), used by
    `ssd_lite_mobilenet_v2` (hubconf.py:24-52).

Each extractor's __call__ returns List[feature_map] (NHWC), ordered from the
highest-resolution map down, and exposes `out_channels` so builders can size
the heads without a dummy forward (the reference infers channels by running
one, _utils.py:383-409 — unnecessary here since shapes are static).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from demonet_tpu.models.layers import (
    ConvBNAct,
    NORMAL_003,
    make_divisible,
    relu6,
)
from demonet_tpu.models.mobilenetv2 import MobileNetV2Features
from demonet_tpu.models.mobilenetv3 import (
    MobileNetV3Features,
    mobilenet_v3_conf,
)

Dtype = Any


class _SSDLiteExtraBlock(nn.Module):
    """1x1 project-to-half + 3x3 s2 depthwise + 1x1 expand, all ReLU6
    (reference ssd_mobilenetv3.py:39-54)."""

    features: int
    bn_eps: float = 1e-3
    bn_momentum: float = 0.97
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.features // 2
        kw = dict(bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                  kernel_init=NORMAL_003, dtype=self.dtype)
        x = ConvBNAct(mid, 1, act=relu6, name="proj", **kw)(x, train)
        x = ConvBNAct(mid, 3, stride=2, groups=mid, act=relu6, name="dw", **kw)(x, train)
        x = ConvBNAct(self.features, 1, act=relu6, name="expand", **kw)(x, train)
        return x


class SSDLiteMobileNetExtractor(nn.Module):
    """MobileNetV3 trunk (C4 split) + 4 SSDLite extra blocks -> 6 maps.

    At 320x320 (mobilenet_v3_large, reduced tail) the maps are
    20^2x672, 10^2x480, 5^2x512, 3^2x256, 2^2x256, 1^2x128.
    """

    arch: str = "mobilenet_v3_large"
    width_mult: float = 1.0
    reduced_tail: bool = True
    # SSDLite detection BN: eps 0.001, torch momentum 0.03
    # (reference ssd_mobilenetv3.py:196) => flax decay 0.97.
    bn_eps: float = 1e-3
    bn_momentum: float = 0.97
    min_depth: int = 16
    dtype: Dtype = jnp.float32
    lane_pack: bool = False  # pack early trunk blocks (ops/lane_pack.py)
    lane_pack_max_lanes: int = 128
    stem_s2d: bool = False  # space-to-depth stem conv (exact)

    def setup(self):
        rows, _ = mobilenet_v3_conf(self.arch, self.width_mult, self.reduced_tail)
        self.trunk = MobileNetV3Features(
            tuple(rows), bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
            dtype=self.dtype, lane_pack=self.lane_pack,
            lane_pack_max_lanes=self.lane_pack_max_lanes,
            stem_s2d=self.stem_s2d)
        get_depth = lambda d: max(self.min_depth, int(d * self.width_mult))  # noqa: E731
        self.extras = [
            _SSDLiteExtraBlock(get_depth(c), bn_eps=self.bn_eps,
                               bn_momentum=self.bn_momentum, dtype=self.dtype)
            for c in (512, 256, 256, 128)
        ]
        self._configs = tuple(rows)

    @property
    def out_channels(self) -> List[int]:
        rows = self._configs
        c4 = max(i for i, c in enumerate(rows) if c.stride > 1)
        get_depth = lambda d: max(self.min_depth, int(d * self.width_mult))  # noqa: E731
        return [rows[c4].expanded_channels, 6 * rows[-1].out_channels,
                get_depth(512), get_depth(256), get_depth(256), get_depth(128)]

    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        outputs = self.trunk(x, train=train, c4_split=True)
        x = outputs[-1]
        for block in self.extras:
            x = block(x, train)
            outputs.append(x)
        return outputs


class _ExtraInvertedResidual(nn.Module):
    """Legacy extra block: fractional-expand inverted residual
    (reference backbone.py:81-119; expand ratios < 1)."""

    features: int
    expand_ratio: float
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        y = ConvBNAct(hidden, 1, act=relu6, bn_eps=1e-5, bn_momentum=0.9,
                      dtype=self.dtype, name="pw")(x, train)
        y = ConvBNAct(hidden, 3, stride=self.stride, groups=hidden, act=relu6,
                      bn_eps=1e-5, bn_momentum=0.9, dtype=self.dtype,
                      name="dw")(y, train)
        y = ConvBNAct(self.features, 1, act=None, bn_eps=1e-5, bn_momentum=0.9,
                      dtype=self.dtype, name="pw_linear")(y, train)
        if self.stride == 1 and in_ch == self.features:
            y = x + y
        return y


class MobileNetV2ExtraBlocks(nn.Module):
    """MobileNetV2 + extra blocks — 6 maps at 320^2: 20^2x96(block13),
    10^2x1280(final), 5^2x512, 3^2x256, 2^2x256, 1^2x64.

    Reference backbone.py:45-67 (taps {"13", "18"}; extras
    hidden_dims [512, 256, 256, 64], expand_ratios [0.2, 0.25, 0.5, 0.25]).
    At the legacy 300^2 input size (hubconf.py:45) the maps are
    19^2, 10^2, 5^2, 3^2, 2^2, 1^2 — identical to the reference, since the
    conv padding here reproduces torch's exactly.
    """

    width_mult: float = 1.0
    dtype: Dtype = jnp.float32
    stem_s2d: bool = False

    hidden_dims: Tuple[int, ...] = (512, 256, 256, 64)
    expand_ratios: Tuple[float, ...] = (0.2, 0.25, 0.5, 0.25)

    def setup(self):
        self.trunk = MobileNetV2Features(width_mult=self.width_mult,
                                         dtype=self.dtype,
                                         stem_s2d=self.stem_s2d)
        self.extras = [
            _ExtraInvertedResidual(c, r, dtype=self.dtype)
            for c, r in zip(self.hidden_dims, self.expand_ratios)
        ]

    @property
    def out_channels(self) -> List[int]:
        return [make_divisible(96 * self.width_mult, 8),
                make_divisible(1280 * max(1.0, self.width_mult), 8),
                *self.hidden_dims]

    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        outputs = self.trunk(x, train=train, taps=(13, 18))
        x = outputs[-1]
        for block in self.extras:
            x = block(x, train)
            outputs.append(x)
        return outputs
