"""Export round-trip parity (the reference's ONNX parity test,
test/test_onnx.py:18-74, rebuilt for StableHLO): serialize, deserialize,
call, compare against eager outputs within float tolerance; includes the
no-detections input case (test_onnx.py:126-133)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demonet_tpu.export.stablehlo import (
    export_detector,
    load_exported,
    save_exported,
)
from demonet_tpu.models import ssdlite320_mobilenet_v3_large


@pytest.fixture(scope="module")
def detector_and_vars():
    det = ssdlite320_mobilenet_v3_large(num_classes=5, size=(64, 64))
    variables = det.init(jax.random.PRNGKey(0))
    return det, variables


def test_export_roundtrip_parity(detector_and_vars, tmp_path):
    det, variables = detector_and_vars
    exported = export_detector(det, variables, batch_size=2)
    path = str(tmp_path / "model.stablehlo.bin")
    save_exported(exported, path)
    restored = load_exported(path)

    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    eager = det.predict(variables, images)
    out = restored.call(images)
    np.testing.assert_allclose(
        np.asarray(eager["scores"]), np.asarray(out["scores"]),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(eager["boxes"]), np.asarray(out["boxes"]),
        rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(eager["labels"]), np.asarray(out["labels"]))


def test_export_no_detections_case(detector_and_vars):
    # all-zero input must produce a well-formed padded output
    det, variables = detector_and_vars
    exported = export_detector(det, variables, batch_size=1)
    out = exported.call(jnp.zeros((1, 64, 64, 3)))
    assert out["boxes"].shape == (1, det.config.detections_per_img, 4)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_export_raw_outputs(detector_and_vars):
    det, variables = detector_and_vars
    exported = export_detector(det, variables, batch_size=1,
                               with_postprocess=False)
    out = exported.call(jnp.zeros((1, 64, 64, 3)))
    assert out["cls_logits"].shape[-1] == 5
    assert out["bbox_regression"].shape[-1] == 4


def test_export_mlir_contains_stablehlo(detector_and_vars):
    det, variables = detector_and_vars
    exported = export_detector(det, variables, batch_size=1)
    mlir = exported.mlir_module()
    assert "stablehlo" in mlir


def test_export_fused_postprocess_roundtrip(detector_and_vars, tmp_path):
    """postprocess_impl='fused' bakes the fast serving path into the
    artifact; outputs must equal the reference-postprocess export."""
    det, variables = detector_and_vars
    ref = export_detector(det, variables, batch_size=2)
    fus = export_detector(det, variables, batch_size=2,
                          postprocess_impl="fused")
    path = str(tmp_path / "fused.stablehlo.bin")
    save_exported(fus, path)
    restored = load_exported(path)

    images = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    a = jax.tree_util.tree_map(np.asarray, ref.call(images))
    b = jax.tree_util.tree_map(np.asarray, restored.call(images))
    np.testing.assert_array_equal(a["valid"], b["valid"])
    m = a["valid"]
    np.testing.assert_array_equal(a["labels"][m], b["labels"][m])
    np.testing.assert_allclose(a["scores"][m], b["scores"][m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a["boxes"][m], b["boxes"][m],
                               rtol=1e-4, atol=1e-3)
