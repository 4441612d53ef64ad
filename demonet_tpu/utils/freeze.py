"""Backbone layer freezing as optimizer masks.

The reference freezes parameters in-place with requires_grad_(False) up to a
stage index (`_mobilenet_extractor`, ssd_mobilenetv3.py:143-154;
`_vgg_extractor`, ssd_vgg16.py:124-134; `_validate_trainable_layers`,
backbone_utils.py:4-18). The JAX equivalent is a boolean pytree mask feeding
`optax.masked` / `optax.multi_transform`: frozen parameters simply receive
zero updates, and the mask is explicit state instead of module mutation.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax


def validate_trainable_layers(
    pretrained: bool,
    trainable_layers: Optional[int],
    max_value: int,
    default_value: int,
) -> int:
    """reference backbone_utils.py:4-18 semantics."""
    if not pretrained:
        if trainable_layers is not None and trainable_layers != max_value:
            print("Changing trainable_backbone_layers has no effect without "
                  "pretrained weights; training all layers.")
        return max_value
    if trainable_layers is None:
        trainable_layers = default_value
    if not (0 <= trainable_layers <= max_value):
        raise ValueError(
            f"trainable_layers {trainable_layers} not in [0, {max_value}]")
    return trainable_layers


def path_mask(params: Any, predicate: Callable[[str], bool]) -> Any:
    """Boolean mask pytree: True (trainable) where predicate(path) holds."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    treedef = flat[1]
    leaves = [predicate(jax.tree_util.keystr(path)) for path, _ in flat[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def mobilenet_trainable_mask(params: Any, trainable_layers: int,
                             num_blocks: int = 15) -> Any:
    """Freeze trunk stages from the bottom, SSDLite-style
    (ssd_mobilenetv3.py:143-154). Stage boundaries are the strided blocks;
    `trainable_layers` counts stages from the top (0 = all frozen,
    6 = everything trainable). Extras and heads are always trainable."""
    # stage-opening block indices for mobilenet_v3_large: stem + strided
    stage_starts = [None, 1, 3, 6, 12, num_blocks]  # blocks_i thresholds

    def predicate(path: str) -> bool:
        if "trunk" not in path:
            return True  # extras + heads always train
        if trainable_layers >= 6:
            return True
        if trainable_layers <= 0:
            return False
        # stages kept trainable: the last `trainable_layers` ones
        # stage 5 = last_conv, 4 = blocks_12.., 3 = blocks_6.., etc.
        if "last_conv" in path:
            return trainable_layers >= 1
        if "stem" in path:
            return False
        import re

        m = re.search(r"blocks_(\d+)", path)
        if not m:
            return True
        b = int(m.group(1))
        # map block index -> stage (1..4)
        stage = sum(1 for s in stage_starts[1:5] if s is not None and b >= s)
        # trainable when stage is among the top (trainable_layers - 1) stages
        # below last_conv
        return stage > 4 - (trainable_layers - 1)

    return path_mask(params, predicate)


def masked_optimizer(tx: optax.GradientTransformation,
                     trainable_mask: Any) -> optax.GradientTransformation:
    """Apply `tx` only where mask is True; frozen params get zero updates."""
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable_mask))
