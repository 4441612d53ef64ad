"""Fused trained-model postprocess (detection._postprocess_fused): exact
equality with the reference-shaped pipeline on sparse, dense, tie, and
fallback inputs. On-hardware equality + timing on real trained weights is
tools/check_fused_tpu.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demonet_tpu.models.detection import SSDConfig, postprocess_detections
from demonet_tpu.ops.boxes import box_cxcywh_to_xyxy


def _setup(seed=0, b=3, a=120, c=6, size=(64, 64)):
    rng = np.random.default_rng(seed)
    cfg = SSDConfig(size=size, num_classes=c, score_thresh=0.01,
                    nms_thresh=0.5, detections_per_img=10,
                    topk_candidates=20)
    # anchors: random boxes inside the image
    cxy = rng.random((a, 2)) * 48 + 8
    wh = rng.random((a, 2)) * 24 + 4
    anchors = np.asarray(box_cxcywh_to_xyxy(
        jnp.asarray(np.concatenate([cxy, wh], 1), jnp.float32)))
    deltas = rng.normal(0, 0.4, (b, a, 4)).astype(np.float32)
    # background-dominated logits => all fg scores far below thresh
    logits = np.zeros((b, a, c), np.float32)
    logits[:, :, 0] = 8.0
    return cfg, jnp.asarray(anchors), logits, jnp.asarray(deltas), rng


def _run_both(cfg, anchors, logits, deltas, sizes=None):
    ref = postprocess_detections(jnp.asarray(logits), deltas, anchors, cfg,
                                 original_sizes=sizes, nms_impl="xla",
                                 gather_impl="xla")
    fused = postprocess_detections(jnp.asarray(logits), deltas, anchors, cfg,
                                   original_sizes=sizes, nms_impl="xla",
                                   gather_impl="xla", impl="fused")
    return ref, fused


def _assert_equal(ref, fused):
    np.testing.assert_array_equal(np.asarray(ref["valid"]),
                                  np.asarray(fused["valid"]))
    v = np.asarray(ref["valid"])
    for k in ("scores", "labels"):
        np.testing.assert_array_equal(np.asarray(ref[k])[v],
                                      np.asarray(fused[k])[v], err_msg=k)
    np.testing.assert_allclose(np.asarray(ref["boxes"])[v],
                               np.asarray(fused["boxes"])[v],
                               rtol=1e-5, atol=1e-4)


def test_fused_equals_reference_sparse():
    cfg, anchors, logits, deltas, rng = _setup()
    # sparse spikes: a few confident detections per image, several classes
    for bi in range(3):
        for _ in range(6):
            logits[bi, rng.integers(0, 120), rng.integers(1, 6)] = 12.0
    ref, fused = _run_both(cfg, anchors, logits, deltas)
    assert np.asarray(ref["valid"]).sum() > 0
    _assert_equal(ref, fused)


def test_fused_equals_reference_with_overlaps_needing_nms():
    cfg, anchors, logits, deltas, rng = _setup(seed=1)
    # many spikes on the SAME class so NMS suppression actually fires,
    # including on near-identical anchors
    zeros = jnp.zeros_like(deltas)
    for bi in range(3):
        for k in range(12):
            logits[bi, k, 2] = 12.0 - 0.1 * k
        logits[bi, 60:66, 3] = 11.0
    ref, fused = _run_both(cfg, anchors, logits, zeros)
    assert np.asarray(ref["valid"]).sum() > 0
    _assert_equal(ref, fused)


def test_fused_exact_score_ties():
    cfg, anchors, logits, deltas, _ = _setup(seed=2)
    zeros = jnp.zeros_like(deltas)
    # identical logits => bit-equal softmax scores across anchors/classes
    for bi in range(3):
        logits[bi, [3, 40, 77], 1] = 12.0
        logits[bi, [10, 55], 4] = 12.0
    ref, fused = _run_both(cfg, anchors, logits, zeros)
    _assert_equal(ref, fused)


def test_fused_dense_falls_back():
    cfg, anchors, logits, deltas, rng = _setup(seed=3)
    # uniform logits: every fg score = 1/6 > thresh => dense => per-class
    # cap exceeded => reference fallback inside the cond
    logits[:] = 0.0
    ref, fused = _run_both(cfg, anchors, logits, deltas)
    _assert_equal(ref, fused)


def test_fused_rescales_to_original_sizes():
    cfg, anchors, logits, deltas, rng = _setup(seed=4)
    for bi in range(3):
        logits[bi, rng.integers(0, 120), 1] = 12.0
    sizes = jnp.asarray([[128, 256], [64, 64], [320, 160]], jnp.int32)
    ref, fused = _run_both(cfg, anchors, logits, deltas, sizes=sizes)
    _assert_equal(ref, fused)


def test_fused_no_detections_at_all():
    cfg, anchors, logits, deltas, _ = _setup(seed=5)
    ref, fused = _run_both(cfg, anchors, logits, deltas)
    assert not np.asarray(fused["valid"]).any()
    _assert_equal(ref, fused)


@pytest.mark.parametrize("name", [
    "ssdlite320_mobilenet_v3_large", "ssd300_vgg16", "ssd512_vgg16",
    "pelee304", "ssd_lite_mobilenet_v2"])
def test_fused_equals_reference_real_family_configs(name):
    """The fused path is family-generic: exact equality against the
    reference pipeline at each builder's REAL config + anchor grid
    (anchor counts 2,976-8,732, thresholds 0.001-0.5, 21/91 classes)."""
    from demonet_tpu.models import get_model

    det = get_model(name)
    cfg, anchors = det.config, jnp.asarray(det.anchors)
    a, c = anchors.shape[0], cfg.num_classes
    rng = np.random.default_rng(hash(name) % 2**32)
    b = 2
    logits = np.zeros((b, a, c), np.float32)
    logits[:, :, 0] = 8.0
    # sparse confident spikes incl. same-class overlapping runs so NMS fires
    for bi in range(b):
        for _ in range(8):
            logits[bi, rng.integers(0, a), rng.integers(1, c)] = 12.0
        base = int(rng.integers(0, a - 6))
        logits[bi, base:base + 6, 1 + bi] = 11.0
    deltas = jnp.asarray(rng.normal(0, 0.2, (b, a, 4)).astype(np.float32))
    sizes = jnp.asarray([[480, 640], [333, 500]], jnp.float32)
    ref, fused = _run_both(cfg, anchors, logits, deltas, sizes=sizes)
    assert np.asarray(ref["valid"]).sum() > 0
    _assert_equal(ref, fused)


def test_fused_tier_selection(monkeypatch):
    """Two-tier fast path: per-batch live-anchor maxima landing in tier
    0, tier 1, and past the last tier (reference fallback) all reproduce
    the reference exactly. Tiers shrunk so each regime is reachable at
    test scale."""
    from demonet_tpu.models import detection as det_mod

    monkeypatch.setattr(det_mod, "_FUSED_TIERS", (8, 16))
    for n_live, seed in ((5, 7), (12, 8), (24, 9)):
        cfg, anchors, logits, deltas, rng = _setup(seed=seed)
        for bi in range(3):
            picks = rng.choice(120, size=n_live, replace=False)
            for k, anchor in enumerate(picks):
                logits[bi, anchor, 1 + k % 5] = 12.0 - 0.05 * k
        ref, fused = _run_both(cfg, anchors, logits, deltas)
        assert np.asarray(ref["valid"]).sum() > 0
        _assert_equal(ref, fused)


def test_fused_under_jit_and_tiny_capacity():
    """d > candidate width: outputs padded; jit-compiled path."""
    cfg, anchors, logits, deltas, rng = _setup(seed=6, a=40, c=3)
    cfg = SSDConfig(size=(64, 64), num_classes=3, score_thresh=0.01,
                    nms_thresh=0.5, detections_per_img=100,
                    topk_candidates=20)
    logits[0, 5, 1] = 12.0
    f = jax.jit(lambda lg, dl: postprocess_detections(
        lg, dl, anchors, cfg, nms_impl="xla", gather_impl="xla",
        impl="fused"))
    out = f(jnp.asarray(logits), deltas)
    assert out["boxes"].shape == (3, 100, 4)
    ref = postprocess_detections(jnp.asarray(logits), deltas, anchors, cfg,
                                 nms_impl="xla", gather_impl="xla")
    _assert_equal(ref, out)


def test_fused_batch_sharded_matches_single_device():
    """Serving-at-scale shape: batch sharded over an 8-device mesh. The
    fused path's cross-batch reductions (max_live tier pick, chunk
    budget guard) become collectives under SPMD; outputs must equal the
    single-device run exactly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg, anchors, logits, deltas, rng = _setup(seed=10, b=8)
    for bi in range(8):
        for _ in range(4 + bi):
            logits[bi, rng.integers(0, 120), rng.integers(1, 6)] = \
                10.0 + rng.random()
    logits = jnp.asarray(logits)

    f = lambda lg, dl: postprocess_detections(  # noqa: E731
        lg, dl, anchors, cfg, nms_impl="xla", gather_impl="xla",
        impl="fused")
    single = jax.jit(f)(logits, deltas)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    sharded = jax.jit(f, in_shardings=(batch_sh, batch_sh))(
        jax.device_put(logits, batch_sh), jax.device_put(deltas, batch_sh))
    assert len(sharded["boxes"].sharding.device_set) == 8
    _assert_equal(single, sharded)
    ref = postprocess_detections(logits, deltas, anchors, cfg,
                                 nms_impl="xla", gather_impl="xla")
    _assert_equal(ref, sharded)
