"""Model assembly tests: builder shapes, anchor/head consistency, jit parity.

Mirrors the reference test strategy (test/test_model.py): build each part
standalone with fixed configs, run the assembled model, check outputs — with
jit-vs-eager parity replacing TorchScript-vs-eager (SURVEY.md §4).

Heavy models run at reduced input sizes: everything is shape-polymorphic at
build time (anchors derive from traced feature shapes), so small sizes
exercise identical code paths at a fraction of the compile cost.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demonet_tpu.models import (
    MODEL_REGISTRY,
    get_model,
    ssd_lite_mobilenet_v2,
    ssdlite320_mobilenet_v3_large,
)
from demonet_tpu.models.builders import feature_grid_sizes
from demonet_tpu.models.features import (
    MobileNetV2ExtraBlocks,
    SSDLiteMobileNetExtractor,
)
from demonet_tpu.models.vgg import VGG16SSDExtractor


def test_registry_exports_reference_surface():
    # demonet/models/__init__.py:1-6 + hubconf.py:25
    for name in ("ssdlite320_mobilenet_v3_large", "ssd300_vgg16",
                 "ssd_lite_mobilenet_v2", "mobilenet_v2",
                 "mobilenet_v3_large", "mobilenet_v3_small"):
        assert name in MODEL_REGISTRY
    with pytest.raises(ValueError):
        get_model("nope")


def test_vgg300_grid_sizes():
    # SSD paper (and ssd_vgg16.py): 38, 19, 10, 5, 3, 1 at 300^2.
    grids = feature_grid_sizes(VGG16SSDExtractor(), (300, 300))
    assert grids == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]


def test_vgg512_grid_sizes():
    grids = feature_grid_sizes(VGG16SSDExtractor(highres=True), (512, 512))
    assert len(grids) == 7 and grids[0] == (64, 64) and grids[-1] == (1, 1)


def test_ssdlite_mnv3_grid_sizes():
    # reference ssdlite320: 20, 10, 5, 3, 2, 1 at 320^2.
    grids = feature_grid_sizes(SSDLiteMobileNetExtractor(), (320, 320))
    assert grids == [(20, 20), (10, 10), (5, 5), (3, 3), (2, 2), (1, 1)]


def test_legacy_mnv2_grid_sizes():
    # reference backbone.py taps at 300^2: 19, 10, 5, 3, 2, 1.
    grids = feature_grid_sizes(MobileNetV2ExtraBlocks(), (300, 300))
    assert grids == [(19, 19), (10, 10), (5, 5), (3, 3), (2, 2), (1, 1)]


@pytest.fixture(scope="module")
def small_ssdlite():
    det = ssdlite320_mobilenet_v3_large(num_classes=7, size=(160, 160))
    variables = det.init(jax.random.PRNGKey(0))
    return det, variables


def test_ssdlite_forward_consistency(small_ssdlite):
    det, variables = small_ssdlite
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 160, 160, 3))
    out = det.apply(variables, x)
    a = det.anchors.shape[0]
    assert out["cls_logits"].shape == (2, a, 7)
    assert out["bbox_regression"].shape == (2, a, 4)


def test_ssdlite_predict_padded_detections(small_ssdlite):
    det, variables = small_ssdlite
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 160, 160, 3))
    dets = det.predict(variables, x)
    d = det.config.detections_per_img
    assert dets["boxes"].shape == (1, d, 4)
    assert dets["scores"].shape == (1, d)
    assert dets["labels"].shape == (1, d)
    assert dets["valid"].dtype == jnp.bool_
    b = np.asarray(dets["boxes"])
    assert (b >= 0).all() and (b[..., 0::2] <= 160).all() and (b[..., 1::2] <= 160).all()
    # labels of valid detections are foreground classes
    v = np.asarray(dets["valid"])
    lbl = np.asarray(dets["labels"])
    assert (lbl[v] >= 1).all()


def test_ssdlite_loss_finite_and_train_mode(small_ssdlite):
    det, variables = small_ssdlite
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 160, 160, 3))
    gt_boxes = jnp.array([[[10.0, 10.0, 80.0, 80.0], [0, 0, 0, 0]]] * 2)
    gt_labels = jnp.array([[3, 0]] * 2, jnp.int32)
    gt_valid = jnp.array([[True, False]] * 2)
    losses, mutated = det.loss(variables, x, gt_boxes, gt_labels, gt_valid)
    assert np.isfinite(float(losses["classification"]))
    assert np.isfinite(float(losses["bbox_regression"]))
    assert "batch_stats" in mutated
    # BN stats must actually move in train mode
    old = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_jit_vs_eager_parity(small_ssdlite):
    # The reference checks eager == torch.jit.script output exactly
    # (test/test_model.py:78-119); here jit(apply) vs apply.
    det, variables = small_ssdlite
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 160, 160, 3))
    eager = det.apply(variables, x)
    jitted = jax.jit(lambda v, x: det.apply(v, x))(variables, x)
    np.testing.assert_allclose(
        np.asarray(eager["cls_logits"]), np.asarray(jitted["cls_logits"]),
        rtol=2e-5, atol=2e-5)


def test_legacy_v0_model_builds():
    det = ssd_lite_mobilenet_v2(num_classes=6, size=(96, 96))
    variables = det.init(jax.random.PRNGKey(0))
    out = det.apply(variables, jnp.zeros((1, 96, 96, 3)))
    assert out["cls_logits"].shape[-1] == 6
    assert out["cls_logits"].shape[1] == det.anchors.shape[0]
