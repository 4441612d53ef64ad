"""MobileNetV3 large/small (flax.linen, NHWC), incl. reduced-tail variant.

Capability parity with the reference (demonet/models/mobilenetv3.py):
  * the large/small inverted-residual tables (:197-230) with width-mult
    channel adjustment, reduced_tail divider and dilation;
  * SE-with-hardsigmoid and hardswish activations (:22-40, :61-99);
  * classification head (:102-186) for `mobilenet_v3_large/small` (:254/:268);
  * feature trunk with the C4 tap point SSDLite needs (the expand 1x1 of the
    first block of the last stage — reference ssd_mobilenetv3.py:104-108).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from demonet_tpu.models.layers import (
    ConvBNAct,
    InvertedResidualV3,
    hard_swish,
    make_divisible,
)


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    """One inverted-residual row (reference mobilenetv3.py:43-58)."""

    in_channels: int
    kernel: int
    expanded_channels: int
    out_channels: int
    use_se: bool
    use_hs: bool
    stride: int
    dilation: int = 1

    @staticmethod
    def adjust(channels: int, width_mult: float) -> int:
        return make_divisible(channels * width_mult, 8)


def _row(width_mult, inp, k, exp, out, se, act, s, d=1) -> BlockConfig:
    adj = lambda c: BlockConfig.adjust(c, width_mult)  # noqa: E731
    return BlockConfig(adj(inp), k, adj(exp), adj(out), se, act == "HS", s, d)


def mobilenet_v3_conf(
    arch: str,
    width_mult: float = 1.0,
    reduced_tail: bool = False,
    dilated: bool = False,
) -> Tuple[List[BlockConfig], int]:
    """Block tables (reference mobilenetv3.py:189-234). Returns (rows, last_channel)."""
    rd = 2 if reduced_tail else 1
    dil = 2 if dilated else 1
    w = width_mult
    if arch == "mobilenet_v3_large":
        rows = [
            _row(w, 16, 3, 16, 16, False, "RE", 1),
            _row(w, 16, 3, 64, 24, False, "RE", 2),  # C1
            _row(w, 24, 3, 72, 24, False, "RE", 1),
            _row(w, 24, 5, 72, 40, True, "RE", 2),  # C2
            _row(w, 40, 5, 120, 40, True, "RE", 1),
            _row(w, 40, 5, 120, 40, True, "RE", 1),
            _row(w, 40, 3, 240, 80, False, "HS", 2),  # C3
            _row(w, 80, 3, 200, 80, False, "HS", 1),
            _row(w, 80, 3, 184, 80, False, "HS", 1),
            _row(w, 80, 3, 184, 80, False, "HS", 1),
            _row(w, 80, 3, 480, 112, True, "HS", 1),
            _row(w, 112, 3, 672, 112, True, "HS", 1),
            _row(w, 112, 5, 672, 160 // rd, True, "HS", 2, dil),  # C4
            _row(w, 160 // rd, 5, 960 // rd, 160 // rd, True, "HS", 1, dil),
            _row(w, 160 // rd, 5, 960 // rd, 160 // rd, True, "HS", 1, dil),
        ]
        last_channel = BlockConfig.adjust(1280 // rd, w)
    elif arch == "mobilenet_v3_small":
        rows = [
            _row(w, 16, 3, 16, 16, True, "RE", 2),  # C1
            _row(w, 16, 3, 72, 24, False, "RE", 2),  # C2
            _row(w, 24, 3, 88, 24, False, "RE", 1),
            _row(w, 24, 5, 96, 40, True, "HS", 2),  # C3
            _row(w, 40, 5, 240, 40, True, "HS", 1),
            _row(w, 40, 5, 240, 40, True, "HS", 1),
            _row(w, 40, 5, 120, 48, True, "HS", 1),
            _row(w, 48, 5, 144, 48, True, "HS", 1),
            _row(w, 48, 5, 288, 96 // rd, True, "HS", 2, dil),  # C4
            _row(w, 96 // rd, 5, 576 // rd, 96 // rd, True, "HS", 1, dil),
            _row(w, 96 // rd, 5, 576 // rd, 96 // rd, True, "HS", 1, dil),
        ]
        last_channel = BlockConfig.adjust(1024 // rd, w)
    else:
        raise ValueError(f"Unsupported arch {arch!r}")
    return rows, last_channel


class MobileNetV3Features(nn.Module):
    """Trunk: stem conv + inverted residuals + final 6x 1x1 conv.

    ``c4_split=True`` returns [C4, final] where C4 is taken after the expand
    1x1 of the last strided block (MobileNetV3 paper sec. 6.3; reference
    ssd_mobilenetv3.py:104-108). Otherwise returns [final].
    """

    configs: Tuple[BlockConfig, ...]
    bn_eps: float = 1e-3
    bn_momentum: float = 0.99
    dtype: Any = jnp.float32
    # lane-pack the eligible early-block prefix (ops/lane_pack.py): packs
    # W-pixels into vector lanes so the 16-72-channel trunk blocks fill
    # the 128-wide registers. Identical variable tree; training-perf knob.
    lane_pack: bool = False
    lane_pack_max_lanes: int = 128
    # compute the 3-channel stem conv on the space-to-depth layout
    # (ops/lane_pack.s2d_stem_kernel): exact, same variable tree
    stem_s2d: bool = False

    def _pack_plan(self):
        """Per-block run pack factor; 1 = unpacked. Only a PREFIX of
        eligible (3x3, no-SE) blocks packs — the first ineligible or
        no-win block ends it."""
        plan = []
        ended = not self.lane_pack
        for cfg in self.configs:
            p_run = 1
            if not ended and cfg.kernel == 3 and not cfg.use_se \
                    and cfg.dilation == 1:
                for p in (8, 4, 2):
                    if p * cfg.expanded_channels <= self.lane_pack_max_lanes \
                            and p * cfg.in_channels <= self.lane_pack_max_lanes:
                        p_run = p
                        break
            if p_run == 1:
                ended = True
            plan.append(p_run)
        return plan

    def setup(self):
        self.stem = ConvBNAct(
            self.configs[0].in_channels, 3, stride=2, act=hard_swish,
            bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
            dtype=self.dtype, s2d=self.stem_s2d)
        plan = self._pack_plan()
        self._plan = plan
        self.blocks = [
            InvertedResidualV3(
                cfg.in_channels, cfg.expanded_channels, cfg.out_channels,
                cfg.kernel, cfg.stride, cfg.dilation, cfg.use_se, cfg.use_hs,
                bn_eps=self.bn_eps, bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                lane_pack_in=(plan[i - 1] if i and plan[i] > 1 else 1),
                lane_pack_run=plan[i])
            for i, cfg in enumerate(self.configs)
        ]
        self.last_conv = ConvBNAct(
            6 * self.configs[-1].out_channels, 1, act=hard_swish,
            bn_eps=self.bn_eps, bn_momentum=self.bn_momentum, dtype=self.dtype)

    @property
    def c4_block_index(self) -> int:
        """Index (into self.blocks) of the last strided block — the C4 split."""
        return max(i for i, c in enumerate(self.configs) if c.stride > 1)

    def __call__(
        self, x: jnp.ndarray, train: bool = False, c4_split: bool = False
    ) -> List[jnp.ndarray]:
        from demonet_tpu.ops.lane_pack import unpack

        out = []
        x = self.stem(x, train)
        c4 = self.c4_block_index if c4_split else -1
        plan = self._plan
        for i, block in enumerate(self.blocks):
            if i and plan[i - 1] > 1 and plan[i] == 1:
                # packed prefix ended: back to pixel layout
                x = unpack(x, plan[i - 1], self.configs[i].in_channels)
            if i == c4:
                x = block.expand(x, train)
                out.append(x)
                x = block.remainder(x, train)
            else:
                x = block(x, train)
        if plan[-1] > 1:
            x = unpack(x, plan[-1], self.configs[-1].out_channels)
        x = self.last_conv(x, train)
        out.append(x)
        return out


class MobileNetV3(nn.Module):
    """Classifier (reference mobilenetv3.py:102-186)."""

    arch: str = "mobilenet_v3_large"
    num_classes: int = 1000
    width_mult: float = 1.0
    reduced_tail: bool = False
    dilated: bool = False
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        rows, last_channel = mobilenet_v3_conf(
            self.arch, self.width_mult, self.reduced_tail, self.dilated)
        feats = MobileNetV3Features(
            tuple(rows), bn_eps=1e-3, bn_momentum=0.99, dtype=self.dtype,
            name="features")(x, train=train)[-1]
        x = jnp.mean(feats, axis=(1, 2))
        x = nn.Dense(last_channel, dtype=self.dtype, name="pre_classifier")(x)
        x = hard_swish(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)


def mobilenet_v3_large(num_classes: int = 1000, **kwargs: Any) -> MobileNetV3:
    """Builder (reference mobilenetv3.py:254)."""
    return MobileNetV3(arch="mobilenet_v3_large", num_classes=num_classes, **kwargs)


def mobilenet_v3_small(num_classes: int = 1000, **kwargs: Any) -> MobileNetV3:
    """Builder (reference mobilenetv3.py:268)."""
    return MobileNetV3(arch="mobilenet_v3_small", num_classes=num_classes, **kwargs)
