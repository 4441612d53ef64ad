"""Pallas NMS kernel vs the XLA reference implementation (exactness).

Runs in interpret mode on CPU (the kernel compiles natively on TPU; the
driver's bench path exercises that).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demonet_tpu.ops.nms import nms_mask
from demonet_tpu.ops.nms_pallas import nms_keep_batch


def _random_problems(seed, p, k, valid_prefix=None):
    rng = np.random.RandomState(seed)
    centers = rng.rand(p, k, 2).astype(np.float32) * 100
    wh = rng.rand(p, k, 2).astype(np.float32) * 40 + 2
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
    scores = -np.sort(-rng.rand(p, k).astype(np.float32), axis=1)
    if valid_prefix is not None:
        scores[:, valid_prefix:] = -1e30
    return jnp.asarray(boxes), jnp.asarray(scores)


@pytest.mark.parametrize("seed,p,k,prefix", [
    (0, 4, 24, None),
    (1, 3, 40, 17),
    (2, 1, 8, 0),      # nothing valid
    (3, 2, 16, 1),     # single valid candidate
])
def test_pallas_matches_xla(seed, p, k, prefix):
    boxes, scores = _random_problems(seed, p, k, prefix)
    keep_pallas = np.asarray(nms_keep_batch(
        boxes, scores, 0.5, -1e29, chunk=128, interpret=True))
    ref = jax.vmap(functools.partial(
        nms_mask, iou_threshold=0.5, score_threshold=-1e29))
    keep_xla = np.asarray(ref(boxes, scores))
    np.testing.assert_array_equal(keep_pallas, keep_xla)


def test_pallas_identical_boxes_chain():
    # a suppression chain: all identical boxes -> only the top survives
    boxes = jnp.asarray(np.tile(
        np.asarray([[0.0, 0.0, 10.0, 10.0]], np.float32), (6, 1))[None])
    scores = jnp.asarray(-np.sort(-np.random.RandomState(0)
                                  .rand(1, 6).astype(np.float32), axis=1))
    keep = np.asarray(nms_keep_batch(
        boxes, scores, 0.5, -1e29, chunk=128, interpret=True))
    assert keep[0].tolist() == [True] + [False] * 5


def test_vmem_cap_shrinks_chunk_and_stays_exact():
    """k_pad * chunk is capped at 160,000: K=400 problems at the default
    chunk=512 exceeded the 16 MB scoped VMEM limit on the real chip by
    44 KB (ssd300_vgg16's reference postprocess, K=400 x 2,880 problems).
    Trigger the shrink branch cheaply in interpret mode — K=96 with an
    oversized requested chunk (96*2048 > 160,000 -> chunk shrinks to
    (160000//96)//128*128 = 1664, product 159,744) — and pin
    bit-exactness vs the XLA reference. The real-shape run is
    tools/check_fused_tpu.py --model ssd300_vgg16 on the chip."""
    boxes, scores = _random_problems(7, 2, 96, 41)
    keep_pallas = np.asarray(nms_keep_batch(
        boxes, scores, 0.5, -1e29, chunk=2048, interpret=True))
    ref = jax.vmap(functools.partial(
        nms_mask, iou_threshold=0.5, score_threshold=-1e29))
    keep_xla = np.asarray(ref(boxes, scores))
    np.testing.assert_array_equal(keep_pallas, keep_xla)


def test_vmem_cap_never_raises_callers_chunk_and_rejects_oversize_k():
    """The cap only SHRINKS chunk (a caller's explicitly smaller chunk is
    kept even when the product still exceeds the budget at lane-multiple
    granularity -> ValueError instead of silently violating the cap)."""
    import pytest

    boxes, scores = _random_problems(3, 2, 8, 7)
    big_k = np.tile(boxes, (1, 200, 1))[:, :1600]  # K=1600 -> k_pad 1600
    big_s = np.tile(scores, (1, 200))[:, :1600]
    with pytest.raises(ValueError, match="scoped-VMEM cap"):
        nms_keep_batch(big_k, big_s, 0.5, -1e29, chunk=512, interpret=True)
