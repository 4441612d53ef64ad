"""MobileNetV2 (flax.linen, NHWC).

Capability parity with the reference's vendored MobileNetV2
(demonet/models/mobilenetv2.py:103-217): the (t, c, n, s) table at :138-147,
width multiplier with make_divisible rounding, ReLU6 everywhere, and a
classification head for the `mobilenet_v2` builder the models registry
exports (demonet/models/__init__.py:1-6).

`MobileNetV2Features` exposes per-block outputs so detection extractors can
tap intermediate maps (the legacy MobileNetWithExtraBlocks taps block 13's
output and the final 1280-channel conv, demonet/models/backbone.py:52).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from demonet_tpu.models.layers import (
    ConvBNAct,
    InvertedResidualV2,
    make_divisible,
    relu6,
)

# (expand_ratio t, channels c, repeats n, stride s) — SSD paper table,
# reference mobilenetv2.py:138-147.
_V2_SETTING: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2Features(nn.Module):
    """The `features` trunk: first conv + 17 inverted residuals + last conv.

    Block indices match the torch `features` Sequential (0 = stem conv,
    1..17 = inverted residuals, 18 = final 1x1 conv to 1280), which is the
    indexing the legacy extractor uses (backbone.py:52 taps "13" and "18").
    """

    width_mult: float = 1.0
    round_nearest: int = 8
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    dtype: Any = jnp.float32
    stem_s2d: bool = False  # space-to-depth stem conv (exact)

    def setup(self):
        input_channel = make_divisible(32 * self.width_mult, self.round_nearest)
        self.last_channel = make_divisible(
            1280 * max(1.0, self.width_mult), self.round_nearest)
        self.stem = ConvBNAct(
            input_channel, 3, stride=2, act=relu6, bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum, dtype=self.dtype,
            s2d=self.stem_s2d)
        blocks = []
        strided = []  # torch marks `_is_cn` on stride-2 blocks
        ch = input_channel
        for t, c, n, s in _V2_SETTING:
            out_ch = make_divisible(c * self.width_mult, self.round_nearest)
            for i in range(n):
                stride = s if i == 0 else 1
                blocks.append(InvertedResidualV2(
                    out_ch, stride, t, bn_eps=self.bn_eps,
                    bn_momentum=self.bn_momentum, dtype=self.dtype))
                strided.append(stride > 1)
                ch = out_ch
        self.blocks = blocks
        self._strided = tuple(strided)
        self.last_conv = ConvBNAct(
            self.last_channel, 1, act=relu6, bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum, dtype=self.dtype)

    @property
    def stage_block_indices(self) -> List[int]:
        """Indices (in `features` numbering) of stage-opening blocks.

        Mirrors the `_is_cn` scan at reference ssd_mobilenetv3.py:145:
        [0] + strided block indices + [last].
        """
        idx = [0]
        for i, s in enumerate(self._strided):
            if s:
                idx.append(i + 1)  # +1 for the stem at position 0
        idx.append(len(self.blocks) + 1)
        return idx

    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        taps: Optional[Tuple[int, ...]] = None,
    ) -> List[jnp.ndarray]:
        """Run the trunk; return the outputs at `taps` (features indices).

        taps=None returns just the final output.
        """
        wanted = set(taps) if taps is not None else {len(self.blocks) + 1}
        out = []
        x = self.stem(x, train)
        if 0 in wanted:
            out.append(x)
        for i, block in enumerate(self.blocks):
            x = block(x, train)
            if (i + 1) in wanted:
                out.append(x)
        x = self.last_conv(x, train)
        if (len(self.blocks) + 1) in wanted:
            out.append(x)
        return out


class MobileNetV2(nn.Module):
    """Classifier (reference mobilenetv2.py:103-201, `mobilenet_v2` :203)."""

    num_classes: int = 1000
    width_mult: float = 1.0
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = MobileNetV2Features(
            width_mult=self.width_mult, dtype=self.dtype, name="features")(
                x, train=train)[-1]
        x = jnp.mean(feats, axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)


def mobilenet_v2(num_classes: int = 1000, **kwargs: Any) -> MobileNetV2:
    """Builder with the reference's public name (mobilenetv2.py:203)."""
    return MobileNetV2(num_classes=num_classes, **kwargs)
