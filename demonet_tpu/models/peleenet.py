"""PeleeNet backbone + Pelee-SSD extractor (flax.linen, NHWC).

Capability parity with the reference:
  * PeleeNet classifier (demonet/models/peleenet.py:116-218): two-way stem
    block (:78-113), two-branch dense layers (:30-58), dense blocks
    (3, 4, 8, 6) with growth 32 and bn_size (1, 2, 4, 4), 1x1 transitions
    with ceil-mode avg-pooling, final 704-feature linear classifier.
  * Pelee-SSD feature extractor (demonet/models/pelee.py:12-212, the v0
    detector whose import graph was broken — restored working): trunk taps at
    transition3 (19^2 x 512 @ 304) and transition4 (10^2 x 704), 6 extra
    convs yielding 5^2/3^2/1^2 x 256 maps (:110-140), a two-branch ResBlock
    per source feeding 256-channel maps to the 1x1 heads (:143-167).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def avg_pool_torch(x: jnp.ndarray, k: int, s: int,
                   ceil_mode: bool = False) -> jnp.ndarray:
    """torch AvgPool2d on NHWC; ceil_mode divides partial windows by their
    actual element count (torch semantics with no explicit padding)."""
    pads: List[Tuple[int, int]] = []
    for dim in x.shape[1:3]:
        hi = 0
        if ceil_mode:
            rem = (dim - k) % s
            if rem != 0:
                hi = s - rem
        pads.append((0, hi))
    window = (1, k, k, 1)
    strides = (1, s, s, 1)
    padding = ((0, 0), pads[0], pads[1], (0, 0))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window, strides, padding)
    counts = jax.lax.reduce_window(
        jnp.ones(x.shape[:3] + (1,), x.dtype), 0.0, jax.lax.add,
        window, strides, padding)
    return summed / counts


class BasicConv2d(nn.Module):
    """conv (no bias) + BN + optional ReLU (reference peleenet.py:13-27)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    activation: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=((self.padding, self.padding),
                             (self.padding, self.padding)),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.relu(x) if self.activation else x


class DenseLayer(nn.Module):
    """Two-branch dense layer (reference peleenet.py:30-58)."""

    num_input_features: int
    growth_rate: int
    bn_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        growth = self.growth_rate // 2
        inter = int(growth * self.bn_size / 4) * 4
        if inter > self.num_input_features / 2:
            inter = int(self.num_input_features / 8) * 4

        b1 = BasicConv2d(inter, 1, dtype=self.dtype, name="branch1a")(x, train)
        b1 = BasicConv2d(growth, 3, padding=1, dtype=self.dtype,
                         name="branch1b")(b1, train)
        b2 = BasicConv2d(inter, 1, dtype=self.dtype, name="branch2a")(x, train)
        b2 = BasicConv2d(growth, 3, padding=1, dtype=self.dtype,
                         name="branch2b")(b2, train)
        b2 = BasicConv2d(growth, 3, padding=1, dtype=self.dtype,
                         name="branch2c")(b2, train)
        return jnp.concatenate([x, b1, b2], axis=-1)


class StemBlock(nn.Module):
    """Two-way stem (reference peleenet.py:78-113); /4 resolution."""

    num_init_features: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from demonet_tpu.models.vgg import max_pool_torch

        stem_feats = self.num_init_features // 2
        out = BasicConv2d(self.num_init_features, 3, stride=2, padding=1,
                          dtype=self.dtype, name="stem1")(x, train)
        b2 = BasicConv2d(stem_feats, 1, dtype=self.dtype, name="stem2a")(out, train)
        b2 = BasicConv2d(self.num_init_features, 3, stride=2, padding=1,
                         dtype=self.dtype, name="stem2b")(b2, train)
        b1 = max_pool_torch(out, 2, 2, ceil_mode=True)
        out = jnp.concatenate([b1, b2], axis=-1)
        return BasicConv2d(self.num_init_features, 1, dtype=self.dtype,
                           name="stem3")(out, train)


class PeleeNetFeatures(nn.Module):
    """The `features` trunk; taps are indices into the torch Sequential
    [stem, (denseblock, transition[, pool]) x 4] numbering
    (reference pelee.py:55-60 taps k==8 = transition3)."""

    growth_rate: int = 32
    block_config: Tuple[int, ...] = (3, 4, 8, 6)
    num_init_features: int = 32
    bn_size: Tuple[int, ...] = (1, 2, 4, 4)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 taps: Sequence[int] = ()) -> List[jnp.ndarray]:
        wanted = set(taps)
        outputs = []
        idx = 0

        def record(y):
            nonlocal idx
            if idx in wanted:
                outputs.append(y)
            idx += 1

        x = StemBlock(self.num_init_features, dtype=self.dtype,
                      name="stemblock")(x, train)
        record(x)
        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                x = DenseLayer(num_features + j * self.growth_rate,
                               self.growth_rate, self.bn_size[i],
                               dtype=self.dtype,
                               name=f"denseblock{i+1}_layer{j+1}")(x, train)
            num_features += num_layers * self.growth_rate
            record(x)  # denseblock output
            x = BasicConv2d(num_features, 1, dtype=self.dtype,
                            name=f"transition{i+1}")(x, train)
            record(x)  # transition output
            if i != len(self.block_config) - 1:
                x = avg_pool_torch(x, 2, 2, ceil_mode=True)
                record(x)  # pool output
        outputs.append(x)  # final (transition4) always last
        return outputs


class PeleeNet(nn.Module):
    """Classifier (reference peleenet.py:116-190, builder peleenet_v1 :204)."""

    num_classes: int = 1000
    growth_rate: int = 32
    block_config: Tuple[int, ...] = (3, 4, 8, 6)
    num_init_features: int = 32
    bn_size: Tuple[int, ...] = (1, 2, 4, 4)
    drop_rate: float = 0.05
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = PeleeNetFeatures(
            self.growth_rate, self.block_config, self.num_init_features,
            self.bn_size, dtype=self.dtype, name="features")(x, train)[-1]
        x = jnp.mean(feats, axis=(1, 2))
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="classifier")(x)


def peleenet_v1(num_classes: int = 1000, **kwargs: Any) -> PeleeNet:
    """Builder (reference peleenet.py:204-218)."""
    return PeleeNet(num_classes=num_classes, **kwargs)


class _ConvReLU(nn.Module):
    """conv (no bias) + ReLU, no BN (reference pelee.py:99-107)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=((self.padding, self.padding),
                             (self.padding, self.padding)),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    """Two-branch feature refinement before the heads
    (reference pelee.py:143-160)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        o1 = _ConvReLU(128, 1, dtype=self.dtype, name="res1a")(x)
        o1 = _ConvReLU(128, 3, padding=1, dtype=self.dtype, name="res1b")(o1)
        o1 = _ConvReLU(256, 1, dtype=self.dtype, name="res1c")(o1)
        o2 = _ConvReLU(256, 1, dtype=self.dtype, name="res2a")(x)
        return o1 + o2


class PeleeExtractor(nn.Module):
    """PeleeNet trunk (taps transition3 + final) + extras + ResBlocks
    -> 5 maps of 256 channels (reference pelee.py:40-79, :110-167,
    channels/strides/paddings :113-115)."""

    dtype: Dtype = jnp.float32

    # (features, kernel, stride, padding), sources at every 2nd layer
    _extras = ((128, 1, 1, 0), (256, 3, 2, 1), (128, 1, 1, 0),
               (256, 3, 1, 0), (128, 1, 1, 0), (256, 3, 1, 0))

    @property
    def out_channels(self) -> List[int]:
        return [256] * 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        trunk = PeleeNetFeatures(dtype=self.dtype, name="trunk")
        # taps: torch features idx 8 = transition3; final always returned
        sources = trunk(x, train, taps=(8,))
        x = sources[-1]
        for k, (c, ks, s, p) in enumerate(self._extras):
            x = BasicConv2d(c, ks, stride=s, padding=p, dtype=self.dtype,
                            name=f"extras_{k}")(x, train)
            if k % 2 == 1:
                sources.append(x)
        refined = []
        for k, src in enumerate(sources):
            refined.append(ResBlock(dtype=self.dtype,
                                    name=f"resblock_{k}")(src))
        return refined
