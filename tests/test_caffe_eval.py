"""NUMERICAL verification of the Caffe export subsystem: run the emitted
CaffeNet IR under export/caffe_eval.py and compare against the flax forward.
Covers both the hand-built family graphs (export/caffe.py) and the generic
jaxpr transpiler (export/tracing.py) — the reference's converter tests never
executed their outputs (export/model_converter.py has no numeric check)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demonet_tpu.export.caffe_eval import run_caffenet


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


@pytest.fixture(scope="module")
def rng_img():
    r = np.random.default_rng(0)
    return r.random((1, 64, 64, 3), np.float32) * 2.0 - 0.5


def test_hand_graph_mobilenet_v2_numerics(rng_img):
    from demonet_tpu.export.caffe import mobilenet_v2_to_caffe
    from demonet_tpu.models import mobilenet_v2

    m = mobilenet_v2(num_classes=7)
    variables = jax.device_get(
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    net = mobilenet_v2_to_caffe(variables, num_classes=7, input_size=64)
    want = jax.nn.softmax(
        m.apply(variables, jnp.asarray(rng_img), train=False))
    blobs = run_caffenet(net, {"data": _nchw(rng_img)})
    got = blobs["prob"]
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-5)


def test_hand_graph_ssdlite_v2_numerics(rng_img):
    from demonet_tpu.export.caffe import ssd_lite_mobilenet_v2_to_caffe
    from demonet_tpu.models import ssd_lite_mobilenet_v2

    det = ssd_lite_mobilenet_v2(num_classes=5, size=(64, 64))
    variables = jax.device_get(det.init(jax.random.PRNGKey(0)))
    net = ssd_lite_mobilenet_v2_to_caffe(variables, num_classes=5,
                                         input_size=64)
    out = det.model.apply(variables, jnp.asarray(rng_img), train=False)
    blobs = run_caffenet(net, {"data": _nchw(rng_img)})
    # mbox_conf_softmax is (B, sumHWA, C) softmaxed; flax cls_logits raw
    want_conf = np.asarray(
        jax.nn.softmax(out["cls_logits"].astype(jnp.float32), axis=-1))
    got_conf = blobs["mbox_conf_softmax"]
    np.testing.assert_allclose(got_conf, want_conf, rtol=2e-4, atol=2e-5)
    want_loc = np.asarray(out["bbox_regression"]).reshape(1, -1)
    np.testing.assert_allclose(blobs["mbox_loc"], want_loc,
                               rtol=2e-4, atol=2e-5)


def test_hand_graph_ssdlite_mnv3_numerics(rng_img):
    from demonet_tpu.export.caffe import (
        ssdlite320_mobilenet_v3_large_to_caffe)
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large

    det = ssdlite320_mobilenet_v3_large(num_classes=4, size=(64, 64))
    variables = jax.device_get(det.init(jax.random.PRNGKey(1)))
    net = ssdlite320_mobilenet_v3_large_to_caffe(
        variables, num_classes=4, input_size=64)
    out = det.model.apply(variables, jnp.asarray(rng_img), train=False)
    blobs = run_caffenet(net, {"data": _nchw(rng_img)})
    want_conf = np.asarray(
        jax.nn.softmax(out["cls_logits"].astype(jnp.float32), axis=-1))
    np.testing.assert_allclose(blobs["mbox_conf_softmax"], want_conf,
                               rtol=2e-4, atol=2e-5)


def test_hand_graph_pelee_numerics(rng_img):
    from demonet_tpu.export.caffe import pelee304_to_caffe
    from demonet_tpu.models.builders import pelee304

    det = pelee304(num_classes=4, size=(64, 64))
    variables = jax.device_get(det.init(jax.random.PRNGKey(2)))
    net = pelee304_to_caffe(variables, num_classes=4, input_size=64)
    out = det.model.apply(variables, jnp.asarray(rng_img), train=False)
    blobs = run_caffenet(net, {"data": _nchw(rng_img)})
    want_conf = np.asarray(
        jax.nn.softmax(out["cls_logits"].astype(jnp.float32), axis=-1))
    np.testing.assert_allclose(blobs["mbox_conf_softmax"], want_conf,
                               rtol=2e-4, atol=2e-5)
    want_loc = np.asarray(out["bbox_regression"]).reshape(1, -1)
    np.testing.assert_allclose(blobs["mbox_loc"], want_loc,
                               rtol=2e-4, atol=2e-5)


def test_hand_graph_vgg_numerics(rng_img):
    from demonet_tpu.export.caffe import ssd300_vgg16_to_caffe
    from demonet_tpu.models import ssd300_vgg16

    det = ssd300_vgg16(num_classes=4)
    variables = jax.device_get(det.init(jax.random.PRNGKey(3)))
    net = ssd300_vgg16_to_caffe(variables, num_classes=4, input_size=64)
    img = np.random.default_rng(1).random((1, 64, 64, 3), np.float32)
    out = det.model.apply(variables, jnp.asarray(img), train=False)
    blobs = run_caffenet(net, {"data": _nchw(img)})
    want_conf = np.asarray(
        jax.nn.softmax(out["cls_logits"].astype(jnp.float32), axis=-1))
    np.testing.assert_allclose(blobs["mbox_conf_softmax"], want_conf,
                               rtol=2e-4, atol=2e-5)


# ---------------- generic jaxpr transpiler ----------------


def test_generic_mobilenet_v2(rng_img):
    from demonet_tpu.export.tracing import trace_to_caffe
    from demonet_tpu.models import mobilenet_v2

    m = mobilenet_v2(num_classes=7)
    variables = jax.device_get(
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    net = trace_to_caffe(
        lambda x: m.apply(variables, x, train=False),
        jnp.asarray(rng_img), name="mnv2_generic")
    want = np.asarray(m.apply(variables, jnp.asarray(rng_img), train=False))
    blobs = run_caffenet(net, {"data": _nchw(rng_img)})
    got = blobs[net.layers[-1].tops[0]]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # BN folded: generic graph uses Scale layers, no BatchNorm
    types = {l.type for l in net.layers}
    assert "BatchNorm" not in types
    assert "ReLU6" in types


def test_generic_mobilenet_v3(rng_img):
    """hard-swish (Power/Eltwise) + SE (two-bottom Scale) via the generic
    path."""
    from demonet_tpu.export.tracing import trace_to_caffe
    from demonet_tpu.models import mobilenet_v3_small

    m = mobilenet_v3_small(num_classes=6)
    variables = jax.device_get(
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    net = trace_to_caffe(
        lambda x: m.apply(variables, x, train=False),
        jnp.asarray(rng_img), name="mnv3_generic")
    want = np.asarray(m.apply(variables, jnp.asarray(rng_img), train=False))
    blobs = run_caffenet(net, {"data": _nchw(rng_img)})
    got = blobs[net.layers[-1].tops[0]]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    types = [l.type for l in net.layers]
    assert "Eltwise" in types          # hard-swish products / residuals
    assert any(len(l.bottoms) == 2 and l.type == "Scale"
               for l in net.layers)    # SE gates


def test_generic_ssdlite_detector_raw_heads(rng_img):
    """Full detector trunk+heads (raw outputs, like the reference's ONNX
    export, onnx_export.py:24-32) through the generic path."""
    from demonet_tpu.export.tracing import trace_to_caffe
    from demonet_tpu.models import ssd_lite_mobilenet_v2

    det = ssd_lite_mobilenet_v2(num_classes=5, size=(64, 64))
    variables = jax.device_get(det.init(jax.random.PRNGKey(0)))

    def raw(x):
        out = det.model.apply(variables, x, train=False)
        return out["cls_logits"], out["bbox_regression"]

    net = trace_to_caffe(raw, jnp.asarray(rng_img), name="ssdlite_generic")
    want_cls, want_reg = (np.asarray(v) for v in raw(jnp.asarray(rng_img)))
    blobs = run_caffenet(net, {"data": _nchw(rng_img)})
    got_cls, got_reg = (blobs[t] for t in net.output_tops)
    np.testing.assert_allclose(got_cls, want_cls, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_reg, want_reg, rtol=2e-4, atol=2e-5)


def test_generic_pelee_detector_raw_heads(rng_img):
    """PeleeNet trunk through the generic path: two-branch dense layers,
    ceil-mode AVE transition pools (reduce_window_sum + counts-division
    cancellation), ResBlocks, 1x1 heads."""
    from demonet_tpu.export.tracing import trace_to_caffe
    from demonet_tpu.models.builders import pelee304

    det = pelee304(num_classes=4, size=(64, 64))
    variables = jax.device_get(det.init(jax.random.PRNGKey(2)))

    def raw(x):
        out = det.model.apply(variables, x, train=False)
        return out["cls_logits"], out["bbox_regression"]

    net = trace_to_caffe(raw, jnp.asarray(rng_img), name="pelee_generic")
    want_cls, want_reg = (np.asarray(v) for v in raw(jnp.asarray(rng_img)))
    blobs = run_caffenet(net, {"data": _nchw(rng_img)})
    got_cls, got_reg = (blobs[t] for t in net.output_tops)
    np.testing.assert_allclose(got_cls, want_cls, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_reg, want_reg, rtol=2e-4, atol=2e-5)
    # AVE pools present with the caffe count semantics handled
    assert any(l.type == "Pooling" and l.params.get("pool") == 1
               for l in net.layers)


def test_generic_vgg_detector_raw_heads():
    """SSD300-VGG16 through the generic path: the conv4_3 L2-Normalize
    chain (x^2 -> channel sum -> sqrt -> eps-guarded divide, times learned
    scales) must pattern-match to the SSD-fork Normalize layer."""
    from demonet_tpu.export.tracing import trace_to_caffe
    from demonet_tpu.models import ssd300_vgg16

    det = ssd300_vgg16(num_classes=3)
    variables = jax.device_get(det.init(jax.random.PRNGKey(4)))
    img = np.random.default_rng(5).random((1, 64, 64, 3), np.float32)

    def raw(x):
        out = det.model.apply(variables, x, train=False)
        return out["cls_logits"], out["bbox_regression"]

    net = trace_to_caffe(raw, jnp.asarray(img), name="vgg_generic")
    assert any(l.type == "Normalize" for l in net.layers)
    want_cls, want_reg = (np.asarray(v) for v in raw(jnp.asarray(img)))
    blobs = run_caffenet(net, {"data": _nchw(img)})
    got_cls, got_reg = (blobs[t] for t in net.output_tops)
    np.testing.assert_allclose(got_cls, want_cls, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_reg, want_reg, rtol=2e-4, atol=2e-5)


def test_generic_unsupported_primitive_message():
    from demonet_tpu.export.tracing import trace_to_caffe

    with pytest.raises(NotImplementedError, match="no Caffe mapping"):
        trace_to_caffe(lambda x: jnp.sort(x, axis=-1),
                       jnp.zeros((1, 8, 8, 3)), name="bad")


def test_generic_rejects_scaled_norm_and_2d_normalize():
    """Review findings: a scaled norm chain (RMS-norm mean factor) or a 2D
    embedding normalize must be REJECTED, not silently mis-exported."""
    from demonet_tpu.export.tracing import trace_to_caffe

    def rmsnorm(x):
        return x / jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True))

    with pytest.raises(NotImplementedError):
        trace_to_caffe(rmsnorm, jnp.ones((1, 4, 4, 8)), name="rms")

    def embed_norm(x):
        e = jnp.mean(x, axis=(1, 2))
        return e / jnp.sqrt(jnp.sum(jnp.square(e), axis=-1, keepdims=True))

    with pytest.raises(NotImplementedError):
        trace_to_caffe(embed_norm, jnp.ones((2, 4, 4, 8)), name="emb")
