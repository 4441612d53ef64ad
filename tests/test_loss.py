"""MultiBox loss semantics vs a straightforward numpy re-derivation of the
reference's compute_loss (demonet/models/generalized_ssd.py:210-269)."""

import numpy as np
import jax.numpy as jnp
import pytest

from demonet_tpu.models.losses import match_batch, multibox_loss, smooth_l1
from demonet_tpu.ops.boxes import encode_boxes


def _softmax_ce(logits, target):
    z = logits - logits.max()
    logp = z - np.log(np.exp(z).sum())
    return -logp[target]


def test_smooth_l1_values():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    out = np.asarray(smooth_l1(x))
    np.testing.assert_allclose(out, [1.5, 0.125, 0.0, 0.125, 1.5])


def test_multibox_loss_against_numpy():
    rng = np.random.RandomState(0)
    B, A, C, G = 2, 8, 4, 3
    anchors = np.zeros((A, 4), np.float32)
    # anchors along a line, 10x10 each
    for i in range(A):
        anchors[i] = [i * 12, 0, i * 12 + 10, 10]
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_labels = np.zeros((B, G), np.int32)
    gt_valid = np.zeros((B, G), bool)
    # image 0: one gt on anchor 1
    gt_boxes[0, 0] = [12, 0, 22, 10]
    gt_labels[0, 0] = 2
    gt_valid[0, 0] = True
    # image 1: no gt (all padding)

    cls_logits = rng.randn(B, A, C).astype(np.float32)
    bbox_reg = rng.randn(B, A, 4).astype(np.float32) * 0.1

    losses = multibox_loss(
        jnp.asarray(cls_logits), jnp.asarray(bbox_reg), jnp.asarray(anchors),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        neg_to_pos_ratio=3.0)

    # --- numpy re-derivation ---
    matched = np.asarray(match_batch(
        jnp.asarray(anchors), jnp.asarray(gt_boxes), jnp.asarray(gt_valid)))
    assert matched[0, 1] == 0  # anchor 1 matches the gt
    assert (matched[1] == -1).all()

    fg = matched >= 0
    n = max(1, fg.sum())
    assert n == fg[0].sum()  # only image 0 has foreground

    # regression: smooth-L1 on encoded target for the single fg anchor
    tgt = np.asarray(encode_boxes(
        jnp.asarray(gt_boxes[0, 0:1]), jnp.asarray(anchors[1:2])))[0]
    diff = bbox_reg[0, 1] - tgt
    exp_reg = np.where(np.abs(diff) < 1, 0.5 * diff ** 2, np.abs(diff) - 0.5).sum() / n
    assert float(losses["bbox_regression"]) == pytest.approx(exp_reg, rel=1e-4)

    # classification: fg CE + top-3*num_pos negative CE per image
    ce = np.zeros((B, A))
    for b in range(B):
        for a in range(A):
            t = gt_labels[b, matched[b, a]] if matched[b, a] >= 0 else 0
            ce[b, a] = _softmax_ce(cls_logits[b, a], t)
    exp_cls = ce[0, 1]  # foreground term
    # negatives image 0: top 3 of the 7 non-fg anchors by CE
    neg0 = np.sort(ce[0][~fg[0]])[::-1][:3].sum()
    # image 1 has num_pos 0 -> no negatives selected
    exp_cls = (exp_cls + neg0) / n
    assert float(losses["classification"]) == pytest.approx(exp_cls, rel=1e-4)


def test_loss_no_foreground_safe():
    B, A, C, G = 1, 4, 3, 2
    losses = multibox_loss(
        jnp.zeros((B, A, C)), jnp.zeros((B, A, 4)),
        jnp.array([[0, 0, 10, 10]] * A, jnp.float32),
        jnp.zeros((B, G, 4)), jnp.zeros((B, G), jnp.int32),
        jnp.zeros((B, G), bool))
    assert np.isfinite(float(losses["classification"]))
    assert float(losses["bbox_regression"]) == 0.0


def test_loss_is_differentiable():
    import jax

    B, A, C, G = 1, 6, 3, 2
    anchors = jnp.array([[i * 12.0, 0, i * 12 + 10, 10] for i in range(A)])
    gt_boxes = jnp.array([[[13.0, 1, 24, 10], [0, 0, 0, 0]]])
    gt_labels = jnp.array([[1, 0]], jnp.int32)
    gt_valid = jnp.array([[True, False]])

    def total(params):
        cls, reg = params
        l = multibox_loss(cls, reg, anchors, gt_boxes, gt_labels, gt_valid)
        return l["classification"] + l["bbox_regression"]

    cls = jnp.ones((B, A, C)) * 0.1
    reg = jnp.zeros((B, A, 4))
    g_cls, g_reg = jax.grad(total)((cls, reg))
    assert np.isfinite(np.asarray(g_cls)).all()
    assert np.isfinite(np.asarray(g_reg)).all()
    assert np.abs(np.asarray(g_reg)).sum() > 0
