"""NMS semantics tests vs hand-worked greedy suppression examples
(the keep sets torchvision nms/batched_nms would produce —
reference call sites generalized_ssd.py:389, box_head.py:374)."""

import numpy as np
import jax.numpy as jnp

from demonet_tpu.ops.nms import batched_nms, nms, nms_mask


def _boxes():
    return jnp.array([
        [0.0, 0.0, 10.0, 10.0],   # A
        [1.0, 1.0, 11.0, 11.0],   # B: IoU(A,B) ~ 0.68
        [20.0, 20.0, 30.0, 30.0],  # C: disjoint
        [0.0, 0.0, 10.0, 10.0],   # D: duplicate of A
    ])


def test_nms_mask_greedy():
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    keep = np.asarray(nms_mask(_boxes(), scores, 0.5))
    # A kept; B suppressed by A; C kept; D suppressed by A.
    assert keep.tolist() == [True, False, True, False]


def test_nms_mask_order_dependence():
    # If B outscores A, B survives and suppresses A.
    scores = jnp.array([0.8, 0.9, 0.7, 0.6])
    keep = np.asarray(nms_mask(_boxes(), scores, 0.5))
    assert keep.tolist() == [False, True, True, False]


def test_nms_high_threshold_keeps_all():
    # strict > comparison: IoU(A, D) == 1.0 is not > 1.0, so even exact
    # duplicates survive at threshold 1.0
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    keep = np.asarray(nms_mask(_boxes(), scores, 1.0))
    assert keep.tolist() == [True, True, True, True]
    # and at 0.99 the duplicate D (IoU 1.0 with A) is suppressed
    keep2 = np.asarray(nms_mask(_boxes(), scores, 0.99))
    assert keep2.tolist() == [True, True, True, False]


def test_nms_score_threshold_padding():
    scores = jnp.array([0.9, -1e30, 0.7, 0.6])
    keep = np.asarray(nms_mask(_boxes(), scores, 0.5, score_threshold=-1e29))
    assert keep.tolist() == [True, False, True, False]
    # and the padded entry doesn't suppress anyone else even when "on top"
    scores2 = jnp.array([0.5, -1e30, 0.7, 0.6])
    keep2 = np.asarray(nms_mask(_boxes(), scores2, 0.5, score_threshold=-1e29))
    assert keep2.tolist() == [False, False, True, True]  # D beats A now


def test_nms_returns_sorted_topk():
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    idx, valid = nms(_boxes(), scores, 0.5, max_output=3)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert idx[valid].tolist() == [0, 2]  # score-descending keep order
    assert valid.tolist() == [True, True, False]


def test_batched_nms_classes_dont_suppress():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    scores = jnp.array([0.9, 0.8])
    labels = jnp.array([1, 2])
    idx, valid = batched_nms(boxes, scores, labels, 0.5, max_output=2)
    assert np.asarray(valid).tolist() == [True, True]
    # same class: second suppressed
    idx2, valid2 = batched_nms(boxes, scores, jnp.array([1, 1]), 0.5, 2)
    assert np.asarray(valid2).tolist() == [True, False]


def test_nms_jit_and_vmap():
    import jax

    boxes = jnp.stack([_boxes(), _boxes()])
    scores = jnp.array([[0.9, 0.8, 0.7, 0.6], [0.8, 0.9, 0.7, 0.6]])
    f = jax.jit(jax.vmap(lambda b, s: nms_mask(b, s, 0.5)))
    keep = np.asarray(f(boxes, scores))
    assert keep[0].tolist() == [True, False, True, False]
    assert keep[1].tolist() == [False, True, True, False]
