"""SSD prediction heads (classification + box regression).

Capability parity with the reference:
  * `SSDHead` — one plain 3x3 conv per feature map for each of cls/reg,
    xavier-uniform init (reference demonet/models/generalized_ssd.py:17-93).
  * `SSDLiteHead` — depthwise-separable prediction blocks, normal(0, 0.03)
    init (reference demonet/models/ssd_mobilenetv3.py:27-96; legacy
    MultiBoxLiteHead, box_head.py:37-104).

Layout: each level's conv produces NHWC (N, H, W, A*K); reshaping to
(N, H*W*A, K) and concatenating across levels gives exactly the reference's
location-major/anchor-minor (N, sum HWA, K) layout (generalized_ssd.py:60-74)
without any permute — NHWC makes the reference's NCHW permute dance a no-op.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from demonet_tpu.models.layers import NORMAL_003, SeparableConv

Dtype = Any

_xavier = nn.initializers.xavier_uniform()


def _flatten_levels(outputs: Sequence[jnp.ndarray], k: int) -> jnp.ndarray:
    """[(N, H, W, A*K), ...] -> (N, sum HWA, K)."""
    flat = [o.reshape(o.shape[0], -1, k) for o in outputs]
    return jnp.concatenate(flat, axis=1)


class SSDHead(nn.Module):
    """Plain-conv SSD head (reference generalized_ssd.py:25-93)."""

    num_anchors: Sequence[int]  # anchors per location, one per level
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        del train
        cls_out, reg_out = [], []
        for i, (x, a) in enumerate(zip(features, self.num_anchors)):
            cls_out.append(nn.Conv(
                self.num_classes * a, (3, 3), padding=((1, 1), (1, 1)),
                kernel_init=_xavier, bias_init=nn.initializers.zeros,
                dtype=self.dtype, name=f"cls_{i}")(x))
            reg_out.append(nn.Conv(
                4 * a, (3, 3), padding=((1, 1), (1, 1)),
                kernel_init=_xavier, bias_init=nn.initializers.zeros,
                dtype=self.dtype, name=f"reg_{i}")(x))
        return {
            "cls_logits": _flatten_levels(cls_out, self.num_classes),
            "bbox_regression": _flatten_levels(reg_out, 4),
        }


class Pelee1x1Head(nn.Module):
    """Plain 1x1 conv heads on ResBlock-refined 256-channel maps
    (reference pelee.py:170-178)."""

    num_anchors: Sequence[int]
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        del train
        cls_out, reg_out = [], []
        for i, (x, a) in enumerate(zip(features, self.num_anchors)):
            cls_out.append(nn.Conv(
                self.num_classes * a, (1, 1), dtype=self.dtype,
                name=f"cls_{i}")(x))
            reg_out.append(nn.Conv(
                4 * a, (1, 1), dtype=self.dtype, name=f"reg_{i}")(x))
        return {
            "cls_logits": _flatten_levels(cls_out, self.num_classes),
            "bbox_regression": _flatten_levels(reg_out, 4),
        }


class SSDLiteHead(nn.Module):
    """Depthwise-separable SSD head (reference ssd_mobilenetv3.py:65-96).

    `last_plain=True` makes the final level a plain 1x1 conv — the legacy
    MultiBoxLiteHead layout (reference box_head.py:55-56), used by the v0
    ssd_lite_mobilenet_v2 so published checkpoints map 1:1.
    """

    num_anchors: Sequence[int]
    num_classes: int
    bn_eps: float = 1e-3
    bn_momentum: float = 0.97
    last_plain: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        cls_out, reg_out = [], []
        n = len(self.num_anchors)
        for i, (x, a) in enumerate(zip(features, self.num_anchors)):
            if self.last_plain and i == n - 1:
                cls_out.append(nn.Conv(
                    self.num_classes * a, (1, 1), kernel_init=NORMAL_003,
                    dtype=self.dtype, name=f"cls_{i}")(x))
                reg_out.append(nn.Conv(
                    4 * a, (1, 1), kernel_init=NORMAL_003,
                    dtype=self.dtype, name=f"reg_{i}")(x))
                continue
            cls_out.append(SeparableConv(
                self.num_classes * a, 3, bn_eps=self.bn_eps,
                bn_momentum=self.bn_momentum, kernel_init=NORMAL_003,
                dtype=self.dtype, name=f"cls_{i}")(x, train))
            reg_out.append(SeparableConv(
                4 * a, 3, bn_eps=self.bn_eps,
                bn_momentum=self.bn_momentum, kernel_init=NORMAL_003,
                dtype=self.dtype, name=f"reg_{i}")(x, train))
        return {
            "cls_logits": _flatten_levels(cls_out, self.num_classes),
            "bbox_regression": _flatten_levels(reg_out, 4),
        }
