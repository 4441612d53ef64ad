"""Pretrained-weight resolution + loading.

Capability parity with the reference's ``pretrained=True`` flow
(ssd_mobilenetv3.py:20-23 + :221-226, ssd_vgg16.py:19-26 + :207-212,
mobilenetv2.py:11-13 + :213-216, mobilenetv3.py:16-19 + :245-251,
hubconf.py:22 + :40-43): each published checkpoint URL resolves to a file
in a local cache directory, is loaded as a torch state_dict, and is
converted to this framework's ``{'params', 'batch_stats'}`` variables via
``utils.torch_weights``.

This host has no network egress, so resolution is cache-only: a missing
file raises an error that names the URL and the one-command fetch
(``python tools/fetch_weights.py <model>``) to run on a connected machine.
Cache dir: ``$DEMONET_WEIGHTS_DIR`` or ``~/.cache/demonet_tpu/weights``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

# model name -> (url, filename); filenames follow the torch.hub convention
# so a torchvision-populated cache can be symlinked straight in.
PRETRAINED_URLS: Dict[str, str] = {
    # reference ssd_mobilenetv3.py:20-23
    "ssdlite320_mobilenet_v3_large":
        "https://download.pytorch.org/models/"
        "ssdlite320_mobilenet_v3_large_coco-a79551df.pth",
    # reference ssd_vgg16.py:19-21
    "ssd300_vgg16":
        "https://download.pytorch.org/models/ssd300_vgg16_coco-b556d3b4.pth",
    # reference mobilenetv2.py:11-13
    "mobilenet_v2":
        "https://download.pytorch.org/models/mobilenet_v2-b0353104.pth",
    # reference mobilenetv3.py:16-19
    "mobilenet_v3_large":
        "https://download.pytorch.org/models/"
        "mobilenet_v3_large-8738ca79.pth",
    "mobilenet_v3_small":
        "https://download.pytorch.org/models/"
        "mobilenet_v3_small-047dcff4.pth",
}

# Checkpoints the reference loads from a local path, not a URL
# (hubconf.py:22: './checkpoints/mobilenet_v2/ssd_lite_mobilenet_v2_199.pth').
LOCAL_ONLY = {
    "ssd_lite_mobilenet_v2": "ssd_lite_mobilenet_v2_199.pth",
}


def weights_cache_dir() -> str:
    return os.environ.get(
        "DEMONET_WEIGHTS_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "demonet_tpu",
                     "weights"))


def cached_weights_path(model_name: str) -> str:
    """Cache-file path for a model's published checkpoint (may not exist)."""
    if model_name in PRETRAINED_URLS:
        fname = PRETRAINED_URLS[model_name].rsplit("/", 1)[1]
    elif model_name in LOCAL_ONLY:
        fname = LOCAL_ONLY[model_name]
    else:
        raise ValueError(
            f"No published checkpoint known for {model_name!r}; "
            f"available: {sorted(PRETRAINED_URLS) + sorted(LOCAL_ONLY)}")
    return os.path.join(weights_cache_dir(), fname)


def resolve_weights(model_name: str, path: Optional[str] = None) -> str:
    """Return a readable .pth path for `model_name`, or raise with the
    exact URL + fetch command when the cache is cold."""
    if path:
        if not os.path.isfile(path):
            raise FileNotFoundError(f"weights file not found: {path}")
        return path
    cached = cached_weights_path(model_name)
    if os.path.isfile(cached):
        return cached
    url = PRETRAINED_URLS.get(model_name)
    hint = (f"download {url}" if url else
            "obtain the checkpoint from the reference release")
    raise FileNotFoundError(
        f"No cached weights for {model_name!r} at {cached} and this host "
        f"has no network egress. On a connected machine: "
        f"`python tools/fetch_weights.py {model_name}` (or {hint}) and "
        f"copy the file to {weights_cache_dir()} "
        f"(override with $DEMONET_WEIGHTS_DIR).")


def load_pretrained_variables(
    model_name: str,
    path: Optional[str] = None,
    **key_map_kwargs: Any,
) -> Dict[str, Any]:
    """Resolve + load + convert a published checkpoint into flax variables."""
    from demonet_tpu.utils.torch_weights import (
        convert_state_dict, load_torch_checkpoint)

    resolved = resolve_weights(model_name, path)
    return convert_state_dict(
        model_name, load_torch_checkpoint(resolved), **key_map_kwargs)


def apply_pretrained(state, model_name: str, path: Optional[str] = None,
                     **key_map_kwargs: Any):
    """Return `state` with params/batch_stats replaced by the converted
    checkpoint (optimizer state untouched, like the reference loading a
    model-only .pth into an already-constructed trainer)."""
    variables = load_pretrained_variables(model_name, path, **key_map_kwargs)
    return state.replace(params=variables["params"],
                         batch_stats=variables.get("batch_stats", {}))
