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
    artifact; outputs must equal the reference-postprocess export.

    score_thresh is raised (derived from the actual random-weight score
    distribution: the ~80th-largest foreground score) so the candidate
    set is sparse and the fused program's lax.cond takes the FAST branch
    (verified via the guard precondition below), not the trivially-equal
    reference fallback."""
    import dataclasses

    from demonet_tpu.models.detection import preprocess

    det, variables = detector_and_vars
    # fresh-init logits are ~constant (zero-bias heads on ~zero features:
    # exactly 2 unique softmax values) — no threshold can make them
    # sparse. Perturb the params (NOT batch_stats: noisy variances go
    # negative through rsqrt) so scores spread like a trained model's.
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    variables = dict(variables, params=jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.2 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)]))
    images = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    raw = det.model.apply(
        variables, preprocess(images, det.config, resize=False), train=False)
    sc = np.asarray(
        jax.nn.softmax(raw["cls_logits"].astype(jnp.float32), -1)[..., 1:])
    thr = float(np.partition(sc.ravel(), -80)[-80])
    det = dataclasses.replace(
        det, config=dataclasses.replace(det.config, score_thresh=thr))

    # precondition: every image has >0 above-threshold candidates (so the
    # comparison is non-trivial) and far fewer than the fused capacity
    # (so the lax.cond really takes the fast branch)
    above = (sc > thr).sum(axis=(1, 2))
    assert (above > 0).all() and (above < 500).all(), above

    ref = export_detector(det, variables, batch_size=2)
    fus = export_detector(det, variables, batch_size=2,
                          postprocess_impl="fused")
    path = str(tmp_path / "fused.stablehlo.bin")
    save_exported(fus, path)
    restored = load_exported(path)

    a = jax.tree_util.tree_map(np.asarray, ref.call(images))
    b = jax.tree_util.tree_map(np.asarray, restored.call(images))
    np.testing.assert_array_equal(a["valid"], b["valid"])
    m = a["valid"]
    assert m.sum() > 0
    np.testing.assert_array_equal(a["labels"][m], b["labels"][m])
    np.testing.assert_allclose(a["scores"][m], b["scores"][m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a["boxes"][m], b["boxes"][m],
                               rtol=1e-4, atol=1e-3)
