"""VGG16 + SSD300/512 feature extractor (flax.linen, NHWC).

Capability parity with the reference's `SSDFeatureExtractorVGG`
(demonet/models/ssd_vgg16.py:30-109):
  * VGG16 conv trunk (paper cfg "D"), maxpool3 with ceil_mode so 300x300
    input yields the paper's 38x38 conv4_3 map (:37);
  * learned L2-rescale of conv4_3 with scale init 20 (:40, :99-102);
  * modified maxpool5 (3x3 s1 p1) + atrous FC6 (dilation 6) + 1x1 FC7 (:84-90);
  * conv8_2 .. conv11_2 extra blocks, plus the SSD512 conv12_2 when
    ``highres`` (:48-81).

Returns the 6 (or 7 highres) multi-scale maps: conv4_3(rescaled), fc7,
conv8_2, conv9_2, conv10_2, conv11_2[, conv12_2].
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_xavier = nn.initializers.xavier_uniform()


def max_pool_torch(
    x: jnp.ndarray, k: int, s: int, padding: int = 0, ceil_mode: bool = False
) -> jnp.ndarray:
    """torch-style MaxPool2d on NHWC with optional ceil_mode (static shapes).

    Keeps the stock `reduce_window` path (whose VJP is SelectAndScatter)
    on purpose: the dense first-max-mask backward in ops/pool.py is
    bit-equal and looks cheaper op-for-op, but measured 26 ms SLOWER in
    the composed ssd300 train step — see the negative result recorded
    there and in DESIGN.md "VGG train step".
    """
    pads: List[Tuple[int, int]] = []
    for dim in x.shape[1:3]:
        lo, hi = padding, padding
        if ceil_mode:
            rem = (dim + 2 * padding - k) % s
            if rem != 0:
                hi += s - rem
        pads.append((lo, hi))
    return nn.max_pool(x, (k, k), strides=(s, s), padding=pads)


def _conv(name: str, features: int, kernel: int = 3, stride: int = 1,
          padding: int = 1, dilation: int = 1, xavier: bool = False,
          dtype: Dtype = jnp.float32) -> nn.Conv:
    init = _xavier if xavier else nn.initializers.lecun_normal()
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        kernel_init=init, use_bias=True, dtype=dtype, name=name)


class _PackedConv(nn.Module):
    """A 3x3 same-pad conv computed in the lane-packed W layout
    (ops/lane_pack.conv_dense_packed) with the IDENTICAL variable tree as
    the nn.Conv it replaces ({kernel (3,3,CI,CO), bias (CO,)}, same
    inits), so checkpoints and weight converters are layout-agnostic."""

    features: int
    in_features: int
    pack: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from demonet_tpu.ops.lane_pack import conv_dense_packed

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = conv_dense_packed(x.astype(self.dtype),
                              kernel.astype(self.dtype), self.pack)
        return y + jnp.tile(bias, self.pack).astype(y.dtype)


class VGG16SSDExtractor(nn.Module):
    """VGG16 trunk + SSD extras. Call returns the multi-scale feature list."""

    highres: bool = False
    dtype: Dtype = jnp.float32
    # run block 1 (the C=64 stage at full resolution) in the lane-packed
    # W layout: its convs half-fill the 128-wide lanes and measure at
    # 30-45% MXU efficiency (DESIGN.md "Lane-packed VGG block 1") —
    # packing p=2 trades 2x FLOPs for full lane fill. Identical variable
    # tree; numerics equal up to XLA conv summation order.
    lane_pack: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        del train  # no BN in the vgg16 variant
        relu = nn.relu
        c = lambda n, ch, **kw: _conv(n, ch, dtype=self.dtype, **kw)  # noqa: E731

        # --- VGG trunk through conv4_3 (reference ssd_vgg16.py:43-45) ---
        if self.lane_pack:
            from demonet_tpu.ops.lane_pack import pack, packed_pool_2x2
            x = pack(x, 2)  # free reshape: (B, H, W/2, 6)
            x = relu(_PackedConv(64, 3, 2, self.dtype, name="conv1_1")(x))
            x = relu(_PackedConv(64, 64, 2, self.dtype, name="conv1_2")(x))
            # 2x2/s2 pool = slot max + H-pair max; lands UNPACKED at
            # (B, H/2, W/2, 64), where block 2's C=128 fills lanes fully
            x = packed_pool_2x2(x, 64)
        else:
            x = relu(c("conv1_1", 64)(x))
            x = relu(c("conv1_2", 64)(x))
            x = max_pool_torch(x, 2, 2)
        x = relu(c("conv2_1", 128)(x))
        x = relu(c("conv2_2", 128)(x))
        x = max_pool_torch(x, 2, 2)
        x = relu(c("conv3_1", 256)(x))
        x = relu(c("conv3_2", 256)(x))
        x = relu(c("conv3_3", 256)(x))
        x = max_pool_torch(x, 2, 2, ceil_mode=True)  # the :37 ceil_mode patch
        x = relu(c("conv4_1", 512)(x))
        x = relu(c("conv4_2", 512)(x))
        x = relu(c("conv4_3", 512)(x))

        # L2 rescale of conv4_3 (reference :40, :99-102).
        scale = self.param(
            "scale_weight", nn.initializers.constant(20.0), (512,), jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
        rescaled = scale.astype(x.dtype) * x / jnp.maximum(norm, 1e-12)
        outputs = [rescaled]

        # --- extra[0]: conv5_x + modified pool5 + atrous FC6 + FC7 (:84-95) ---
        x = max_pool_torch(x, 2, 2)
        x = relu(c("conv5_1", 512)(x))
        x = relu(c("conv5_2", 512)(x))
        x = relu(c("conv5_3", 512)(x))
        x = max_pool_torch(x, 3, 1, padding=1)
        x = relu(c("fc6", 1024, padding=6, dilation=6, xavier=True)(x))
        x = relu(c("fc7", 1024, kernel=1, padding=0, xavier=True)(x))
        outputs.append(x)

        # --- conv8_2 .. conv11_2 (+conv12_2) extras (:48-81) ---
        x = relu(c("conv8_1", 256, kernel=1, padding=0, xavier=True)(x))
        x = relu(c("conv8_2", 512, stride=2, xavier=True)(x))
        outputs.append(x)
        x = relu(c("conv9_1", 128, kernel=1, padding=0, xavier=True)(x))
        x = relu(c("conv9_2", 256, stride=2, xavier=True)(x))
        outputs.append(x)
        x = relu(c("conv10_1", 128, kernel=1, padding=0, xavier=True)(x))
        x = relu(c("conv10_2", 256, padding=0, xavier=True)(x))
        outputs.append(x)
        x = relu(c("conv11_1", 128, kernel=1, padding=0, xavier=True)(x))
        x = relu(c("conv11_2", 256, padding=0, xavier=True)(x))
        outputs.append(x)
        if self.highres:
            x = relu(c("conv12_1", 128, kernel=1, padding=0, xavier=True)(x))
            x = relu(c("conv12_2", 256, kernel=4, padding=0, xavier=True)(x))
            outputs.append(x)
        return outputs
