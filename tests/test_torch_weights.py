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
    # C4 depthwise: the block[1:] slice PRESERVES child names (1, 2, 3),
    # verified against the real reference model by the full-model oracle
    # (tests/test_reference_full_model.py)
    assert "backbone.features.1.0.1.0.weight" in sd
    assert "backbone.extra.0.0.0.weight" in sd          # extra proj conv
    assert "head.classification_head.module_list.0.1.bias" in sd
    # torch conv layout: stem is (16, 3, 3, 3)
    assert sd["backbone.features.0.0.0.weight"].shape == (16, 3, 3, 3)


def test_ssd_lite_mobilenet_v2_roundtrip():
    from demonet_tpu.models import get_model

    det = get_model("ssd_lite_mobilenet_v2", num_classes=4, size=(64, 64))
    variables = jax.device_get(det.init(jax.random.PRNGKey(0)))
    sd = _roundtrip("ssd_lite_mobilenet_v2", variables)
    # v0 layout (backbone.py:45-67, box_head.py:24-56)
    assert "backbone.body.0.0.weight" in sd            # stem conv
    assert "backbone.body.13.conv.0.0.weight" in sd    # tapped block 13
    assert "backbone.extra_blocks.0.conv.2.weight" in sd   # pw-linear conv
    assert "multibox_head.cls_logits.0.0.weight" in sd     # dw conv
    assert "multibox_head.cls_logits.0.0.bias" in sd       # folded dw bias
    assert "multibox_head.cls_logits.5.weight" in sd       # plain last conv
    assert sd["multibox_head.bbox_pred.5.weight"].shape == (24, 64, 1, 1)


def test_mean_minus_bias_fold():
    """BN(conv+b) == BN'(conv) with mean' = mean - b: the converter must
    produce identical model outputs for biased torch dw convs."""
    from demonet_tpu.utils.torch_weights import convert_state_dict

    sd_keys = key_map_for("ssd_lite_mobilenet_v2")
    entry = next(e for e in sd_keys if e[2] == "mean_minus_bias")
    mean_key, bias_key = entry[1].split("|")
    rng = np.random.default_rng(0)
    # channel count from the conv kernel entry of the same block
    sd = {mean_key: rng.normal(size=8).astype(np.float32),
          bias_key: rng.normal(size=8).astype(np.float32)}
    out = convert_state_dict("ssd_lite_mobilenet_v2", sd, strict=False)
    got = out["batch_stats"]
    # walk to the leaf
    for part in entry[0].split("/")[1:]:
        got = got[part]
    np.testing.assert_allclose(got, sd[mean_key] - sd[bias_key])


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
