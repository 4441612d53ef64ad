"""Hub-style model loading (reference hubconf.py:1-44).

    from demonet_tpu import hub
    det, variables = hub.load("ssd_lite_mobilenet_v2",
                              weights="ckpts/ssd_lite_mobilenet_v2_199.pth")

Resolves names from the same registry as `models.get_model` and loads
weights from either an orbax checkpoint directory or a torch .pth file
(converted on the fly via utils.torch_weights).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax

from demonet_tpu.models import MODEL_REGISTRY, get_model


def list_models() -> list:
    return sorted(MODEL_REGISTRY)


def load(name: str, weights: Optional[str] = None, seed: int = 0,
         pretrained: bool = False, **kwargs: Any) -> Tuple[Any, Any]:
    """Build a model and (optionally) load weights.

    Returns (detector_or_module, variables). `weights` may be an orbax
    checkpoint directory or a torch .pth file. `pretrained=True` resolves
    the published reference checkpoint from the local weights cache
    (reference hubconf.py:40-43; see utils/pretrained.py).
    """
    if pretrained and not weights:
        from demonet_tpu.utils.pretrained import resolve_weights

        weights = resolve_weights(name)
    model = get_model(name, **kwargs)
    is_detector = hasattr(model, "init") and hasattr(model, "config")
    if is_detector:
        variables = model.init(jax.random.PRNGKey(seed))
    else:
        import jax.numpy as jnp

        variables = model.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1, 224, 224, 3)))

    if weights:
        if weights.endswith((".pth", ".pt")):
            from demonet_tpu.utils.torch_weights import (
                convert_state_dict, load_torch_checkpoint)

            variables = convert_state_dict(
                name, load_torch_checkpoint(weights))
        elif os.path.isdir(weights):
            from demonet_tpu.utils.checkpoints import load_variables

            variables = load_variables(weights)
        else:
            raise ValueError(f"unrecognized weights source {weights!r}")
    return model, variables


def ssd_lite_mobilenet_v2(pretrained: bool = False,
                          pretrained_path: Optional[str] = None,
                          image_size: int = 320, score_thresh: float = 0.5,
                          num_classes: int = 21):
    """The reference hub entry's exact signature (hubconf.py:25-44);
    `pretrained=True` resolves the cached v0 checkpoint the reference loads
    from ./checkpoints (hubconf.py:22)."""
    return load("ssd_lite_mobilenet_v2", weights=pretrained_path,
                pretrained=pretrained,
                size=(image_size, image_size), score_thresh=score_thresh,
                num_classes=num_classes)
