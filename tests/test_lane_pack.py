"""Lane-packed early-trunk blocks (ops/lane_pack.py + PackedConvBNAct):
layout math, numeric equivalence with the unpacked modules (forward,
gradients, BN statistics), and identical variable trees."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demonet_tpu.ops.lane_pack import (
    conv_1x1_packed, conv_dw_packed, kron_1x1_kernel, pack,
    packed_batch_stats, packed_dw_kernel, repack, unpack)


def _conv(x, k, stride=1, pad=0, groups=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def test_pack_roundtrip_and_repack():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 4, 16, 3), np.float32))
    for p in (1, 2, 4, 8):
        np.testing.assert_array_equal(unpack(pack(x, p), p, 3), x)
    a = repack(pack(x, 8), 8, 2, 3)
    np.testing.assert_array_equal(a, pack(x, 2))


@pytest.mark.parametrize("p", [1, 2, 8])
def test_conv_1x1_packed_equivalence(p):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 6, 16, 5), np.float32))
    k = jnp.asarray(rng.random((1, 1, 5, 7), np.float32) - 0.5)
    want = _conv(x, k)
    got = unpack(conv_1x1_packed(pack(x, p), k, p), p, 7)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("p,stride", [(1, 1), (2, 1), (8, 1),
                                      (2, 2), (8, 2), (4, 2)])
def test_conv_dw_packed_equivalence(p, stride):
    rng = np.random.default_rng(2)
    c = 6
    x = jnp.asarray(rng.random((2, 8, 16, c), np.float32))
    k = jnp.asarray(rng.random((3, 3, 1, c), np.float32) - 0.5)
    want = _conv(x, k, stride=stride, pad=1, groups=c)
    got_p = conv_dw_packed(pack(x, p), k, p, stride)
    got = unpack(got_p, p, c)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_kron_kernel_structure():
    k = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 1, 2, 3))
    big = kron_1x1_kernel(k, 2)
    assert big.shape == (1, 1, 4, 6)
    np.testing.assert_array_equal(big[0, 0, :2, :3], k[0, 0])
    np.testing.assert_array_equal(big[0, 0, 2:, 3:], k[0, 0])
    np.testing.assert_array_equal(big[0, 0, :2, 3:], 0)


def test_packed_dw_kernel_tap_count():
    c, p = 4, 2
    k = jnp.asarray(np.random.default_rng(3).random((3, 3, 1, c)), jnp.float32)
    big = packed_dw_kernel(k, p, 1)
    assert big.shape == (3, 3, p * c, p * c)
    # each (ky, pack-tap) plane holds exactly the taps routed there
    assert int((np.asarray(big) != 0).sum()) == 3 * 3 * p * c


def test_packed_batch_stats_equal_unpacked():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 4, 16, 5), np.float32))
    m, v = packed_batch_stats(pack(x, 4), 4, 5)
    np.testing.assert_allclose(m, jnp.mean(x, axis=(0, 1, 2)), rtol=1e-6)
    np.testing.assert_allclose(
        v, jnp.mean(jnp.square(x), axis=(0, 1, 2)) -
        jnp.square(jnp.mean(x, axis=(0, 1, 2))), rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# module-level equivalence: packed trunk == unpacked trunk
# ---------------------------------------------------------------------------


def _trunks(size=64):
    from demonet_tpu.models.mobilenetv3 import (
        MobileNetV3Features, mobilenet_v3_conf)

    rows, _ = mobilenet_v3_conf("mobilenet_v3_large", 1.0, True)
    base = MobileNetV3Features(tuple(rows))
    packed = MobileNetV3Features(tuple(rows), lane_pack=True)
    return base, packed


def test_pack_plan_prefix():
    _, packed = _trunks()
    plan = packed._pack_plan()
    # mnv3-large: block0 ce=16 -> p8; block1 ce=64 -> p2; block2 ce=72
    # exceeds 128 lanes at p2 -> prefix ends
    assert plan[0] == 8 and plan[1] == 2
    assert all(p == 1 for p in plan[2:])


def test_packed_trunk_variables_identical():
    base, packed = _trunks()
    x = jnp.zeros((1, 64, 64, 3))
    vb = base.init(jax.random.PRNGKey(0), x)
    vp = packed.init(jax.random.PRNGKey(0), x)
    sb = jax.tree_util.tree_structure(vb)
    sp = jax.tree_util.tree_structure(vp)
    assert sb == sp
    for a, b in zip(jax.tree_util.tree_leaves(vb),
                    jax.tree_util.tree_leaves(vp)):
        np.testing.assert_array_equal(a, b)


def test_packed_trunk_forward_equivalence():
    base, packed = _trunks()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    v = base.init(jax.random.PRNGKey(0), x)
    want = base.apply(v, x, train=False)[-1]
    got = packed.apply(v, x, train=False)[-1]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_packed_trunk_train_stats_and_grads_equivalence():
    base, packed = _trunks()
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    v = base.init(jax.random.PRNGKey(0), x)

    def loss(m, params, stats):
        out, mut = m.apply({"params": params, "batch_stats": stats}, x,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(out[-1] ** 2) * 1e-4, mut["batch_stats"]

    (lb, mb), gb = jax.value_and_grad(
        lambda p: loss(base, p, v["batch_stats"]), has_aux=True)(v["params"])
    (lp, mp), gp = jax.value_and_grad(
        lambda p: loss(packed, p, v["batch_stats"]), has_aux=True)(v["params"])
    np.testing.assert_allclose(lp, lb, rtol=1e-4)
    # BN running stats identical (packed stats are per-true-channel)
    for a, b in zip(jax.tree_util.tree_leaves(mb),
                    jax.tree_util.tree_leaves(mp)):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
    # parameter gradients identical
    flat_b = jax.tree_util.tree_leaves_with_path(gb)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    for (ka, a), (kb, b) in zip(flat_b, flat_p):
        assert ka == kb
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(ka))


def test_packed_detector_builds_and_matches():
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large

    det = ssdlite320_mobilenet_v3_large(num_classes=4, size=(64, 64))
    det_p = ssdlite320_mobilenet_v3_large(num_classes=4, size=(64, 64),
                                          lane_pack=True)
    v = det.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    a = det.apply(v, x, train=False)
    b = det_p.apply(v, x, train=False)
    np.testing.assert_allclose(b["cls_logits"], a["cls_logits"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(b["bbox_regression"], a["bbox_regression"],
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Space-to-depth stem (ops/lane_pack.space_to_depth / s2d_stem_kernel)
# ---------------------------------------------------------------------------


def test_s2d_stem_kernel_exact_vs_direct_conv():
    """(3,3,C,O)/s2 conv == (2,2,4C,O)/s1 conv on space_to_depth input."""
    from demonet_tpu.ops.lane_pack import s2d_stem_kernel, space_to_depth

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 48, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 16)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jax.lax.conv_general_dilated(
        space_to_depth(x), s2d_stem_kernel(k), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_stem_s2d_model_equivalence_and_variable_tree():
    """ssdlite320(stem_s2d=True) shares variables with the plain model and
    produces the same raw outputs; gradients flow through the rearranged
    kernel back to the SAME (3,3,3,16) param."""
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large

    base = ssdlite320_mobilenet_v3_large(num_classes=5, size=(64, 64))
    s2d = ssdlite320_mobilenet_v3_large(num_classes=5, size=(64, 64),
                                        stem_s2d=True)
    v = base.init(jax.random.PRNGKey(0))
    v2 = s2d.init(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape and a.dtype == b.dtype

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out_a = base.model.apply(v, x, train=False)
    out_b = s2d.model.apply(v, x, train=False)  # SAME variables
    for key in out_a:
        np.testing.assert_allclose(
            np.asarray(out_a[key]), np.asarray(out_b[key]),
            rtol=1e-4, atol=1e-5, err_msg=key)

    def loss(params):
        out = s2d.model.apply(
            {**v, "params": params}, x, train=False)
        return jnp.sum(out["cls_logits"] ** 2) * 1e-3

    g = jax.grad(loss)(v["params"])
    stem_g = g["extractor"]["trunk"]["stem"]["conv"]["kernel"]
    assert stem_g.shape == (3, 3, 3, 16)
    assert float(jnp.abs(stem_g).max()) > 0


def test_stem_s2d_mnv2_equivalence():
    """The v2 family's stem accepts the same knob with shared variables."""
    from demonet_tpu.models import get_model

    base = get_model("ssd_lite_mobilenet_v2", num_classes=5, size=(64, 64))
    s2d = get_model("ssd_lite_mobilenet_v2", num_classes=5, size=(64, 64),
                    stem_s2d=True)
    v = base.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out_a = base.model.apply(v, x, train=False)
    out_b = s2d.model.apply(v, x, train=False)
    for key in out_a:
        np.testing.assert_allclose(
            np.asarray(out_a[key]), np.asarray(out_b[key]),
            rtol=1e-4, atol=1e-5, err_msg=key)
