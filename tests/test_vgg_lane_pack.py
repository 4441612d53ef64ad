"""Lane-packed VGG block 1 (ops/lane_pack.conv_dense_packed +
packed_pool_2x2, models/vgg.py lane_pack=True).

The packed trunk must be numerically equivalent to the standard one —
same variable tree, outputs equal up to XLA conv summation order — and
the packed pool's GRADIENT routing must be bit-equal to the standard
2x2 SelectAndScatter's (first maximum in row-major scan order),
engineered ties included.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demonet_tpu.ops.lane_pack import (conv_dense_packed, pack,
                                       packed_pool_2x2, unpack)
from demonet_tpu.models.vgg import max_pool_torch


def _ref_conv(x, kernel, stride=1):
    ph = (kernel.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=((ph, ph), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("ci,co,p", [(3, 8, 2), (8, 8, 2), (8, 16, 4)])
def test_conv_dense_packed_matches_unpacked(ci, co, p):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 8 * p, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32)
    ref = _ref_conv(x, k)
    got = unpack(conv_dense_packed(pack(x, p), k, p), p, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_dense_packed_grads_match():
    """d/dkernel and d/dx of the packed conv == the unpacked conv's."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 12, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((2, 6, 12, 8)), jnp.float32)

    def f_ref(x, k):
        return jnp.vdot(_ref_conv(x, k), cot)

    def f_packed(x, k):
        return jnp.vdot(unpack(conv_dense_packed(pack(x, 2), k, 2), 2, 8),
                        cot)

    gr = jax.grad(f_ref, argnums=(0, 1))(x, k)
    gp = jax.grad(f_packed, argnums=(0, 1))(x, k)
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_packed_pool_forward_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
    ref = max_pool_torch(x, 2, 2)
    got = packed_pool_2x2(pack(x, 2), 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_packed_pool_gradient_routing_bit_equal():
    """Routing == SelectAndScatter's first-max-in-scan-order, ties incl."""
    rng = np.random.default_rng(3)
    x = np.asarray(rng.standard_normal((1, 6, 8, 3)), np.float32)
    # engineer ties in every window position pattern: quantize hard
    x = np.round(x * 2.0) / 2.0
    x = jnp.asarray(x)
    cot_shape = (1, 3, 4, 3)
    cot = jnp.asarray(rng.standard_normal(cot_shape), jnp.float32)

    g_ref = jax.grad(
        lambda v: jnp.vdot(max_pool_torch(v, 2, 2), cot))(x)
    g_pack = jax.grad(
        lambda v: jnp.vdot(packed_pool_2x2(pack(v, 2), 3), cot))(x)
    np.testing.assert_array_equal(np.asarray(g_pack), np.asarray(g_ref))


def test_vgg_lane_pack_model_equivalence():
    """Same variables, same outputs (to conv reassociation) and same
    loss/grads (to tolerance) for ssd300_vgg16 lane_pack on/off."""
    from demonet_tpu.models import ssd300_vgg16

    det_p = ssd300_vgg16(num_classes=7, lane_pack=True)
    det_s = ssd300_vgg16(num_classes=7)
    v = det_s.init(jax.random.PRNGKey(0))
    # identical variable tree
    assert jax.tree_util.tree_structure(
        det_p.init(jax.random.PRNGKey(0))) == \
        jax.tree_util.tree_structure(v)

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 300, 300, 3)), jnp.float32)
    o_p = det_p.model.apply(v, x)
    o_s = det_s.model.apply(v, x)
    for a, b in zip(jax.tree_util.tree_leaves(o_p),
                    jax.tree_util.tree_leaves(o_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    gt_boxes = jnp.asarray([[[20.0, 20.0, 160.0, 160.0]]] * 2)
    gt_labels = jnp.full((2, 1), 1, jnp.int32)
    gt_valid = jnp.ones((2, 1), bool)

    def total_loss(det, variables):
        losses, _ = det.loss(variables, x, gt_boxes, gt_labels, gt_valid)
        return losses["bbox_regression"] + losses["classification"]

    lp, gp = jax.value_and_grad(
        lambda vv: total_loss(det_p, vv))(v)
    ls, gs = jax.value_and_grad(
        lambda vv: total_loss(det_s, vv))(v)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-4)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(gs))
    for path, a in flat_p:
        b = flat_s[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))
