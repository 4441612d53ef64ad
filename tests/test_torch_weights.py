"""Weight-converter round trips: every flax param must map to exactly one
reference-shaped torch key and back, bit-identical, with torch-layout
shapes."""

import numpy as np
import jax
import pytest
from flax.traverse_util import flatten_dict

from demonet_tpu.utils.torch_weights import (
    convert_state_dict,
    key_map_for,
    synthesize_torch_state_dict,
)


def _roundtrip(model_name, variables, **kwargs):
    sd = synthesize_torch_state_dict(model_name, variables, **kwargs)
    # every torch conv weight is 4D OIHW, linear 2D
    for k, v in sd.items():
        if k.endswith(".weight") and "bn" not in k and v.ndim == 4:
            pass  # conv
    restored = convert_state_dict(model_name, sd, **kwargs)
    for coll in ("params", "batch_stats"):
        want = flatten_dict(variables.get(coll, {}))
        got = flatten_dict(restored.get(coll, {}))
        assert set(want) == set(got), (
            f"{coll}: missing {set(want) - set(got)}, "
            f"extra {set(got) - set(want)}")
        for k in want:
            np.testing.assert_array_equal(
                np.asarray(want[k]), got[k], err_msg=str(k))
    return sd


def test_ssdlite_mnv3_roundtrip_covers_all_params():
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large

    det = ssdlite320_mobilenet_v3_large(num_classes=4, size=(64, 64))
    variables = jax.device_get(det.init(jax.random.PRNGKey(0)))
    sd = _roundtrip("ssdlite320_mobilenet_v3_large", variables)
    # spot-check reference key layout (ssd_mobilenetv3.py:104-116)
    assert "backbone.features.0.0.0.weight" in sd       # stem conv
    assert "backbone.features.0.13.0.weight" in sd      # C4 expand conv
    assert "backbone.features.1.0.0.0.weight" in sd     # C4 depthwise
    assert "backbone.extra.0.0.0.weight" in sd          # extra proj conv
    assert "head.classification_head.module_list.0.1.bias" in sd
    # torch conv layout: stem is (16, 3, 3, 3)
    assert sd["backbone.features.0.0.0.weight"].shape == (16, 3, 3, 3)


def test_mobilenet_v2_roundtrip():
    from demonet_tpu.models import mobilenet_v2
    import jax.numpy as jnp

    m = mobilenet_v2(num_classes=10)
    variables = jax.device_get(
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    sd = _roundtrip("mobilenet_v2", variables)
    assert "features.0.0.weight" in sd
    assert "features.1.conv.0.0.weight" in sd   # block without expand: dw
    assert "features.18.0.weight" in sd         # last conv
    assert sd["classifier.1.weight"].shape == (10, 1280)


def test_mobilenet_v3_small_roundtrip():
    from demonet_tpu.models import mobilenet_v3_small
    import jax.numpy as jnp

    m = mobilenet_v3_small(num_classes=10)
    variables = jax.device_get(
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    _roundtrip("mobilenet_v3_small", variables)


def test_ssd_vgg16_roundtrip():
    from demonet_tpu.models import ssd300_vgg16

    det = ssd300_vgg16(num_classes=4)
    variables = jax.device_get(det.init(jax.random.PRNGKey(0)))
    sd = _roundtrip("ssd300_vgg16", variables)
    assert "backbone.features.0.weight" in sd   # conv1_1
    assert "backbone.scale_weight" in sd
    assert "backbone.extra.0.7.1.weight" in sd  # atrous fc6
    assert sd["backbone.extra.0.7.1.weight"].shape == (1024, 512, 3, 3)


def test_missing_keys_strict():
    with pytest.raises(KeyError):
        convert_state_dict("mobilenet_v2", {})
    with pytest.raises(ValueError):
        key_map_for("nope")
