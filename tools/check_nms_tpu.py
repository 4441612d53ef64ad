"""Assert the COMPILED Pallas NMS kernel's keep set on the real TPU.

tests/test_nms_pallas.py cross-checks the kernel in interpret mode on CPU;
this runs the actually-compiled Mosaic kernel on the chip and asserts
keep-set equality against the XLA-scan reference (ops/nms.py::nms_mask)
on adversarial inputs: clustered boxes (deep suppression chains),
duplicated boxes (IoU ties), tied scores, empty problems, and the
all-above-threshold worst case.

    python tools/check_nms_tpu.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from demonet_tpu.ops.nms import nms_mask  # noqa: E402
from demonet_tpu.ops.nms_pallas import nms_keep_batch  # noqa: E402


def make_case(rng, p, k, kind):
    if kind == "clustered":
        centers = rng.random((p, 1, 2)).astype(np.float32) * 280
        xy = centers + rng.normal(0, 6, (p, k, 2)).astype(np.float32)
        wh = np.full((p, k, 2), 40, np.float32) + rng.normal(
            0, 4, (p, k, 2)).astype(np.float32)
    elif kind == "duplicates":
        base = rng.random((p, k // 4 + 1, 4)).astype(np.float32)
        idx = rng.integers(0, base.shape[1], (p, k))
        b = np.take_along_axis(base, idx[..., None].repeat(4, -1), 1)
        xy, wh = b[..., :2] * 280, b[..., 2:] * 60 + 8
    else:  # uniform
        xy = rng.random((p, k, 2)).astype(np.float32) * 280
        wh = rng.random((p, k, 2)).astype(np.float32) * 80 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = -np.sort(-rng.random((p, k)).astype(np.float32), axis=-1)
    if kind == "ties":
        scores = np.round(scores, 1)
        scores = -np.sort(-scores, axis=-1)
    if kind == "empty":
        scores[: p // 2] = 0.0  # below threshold -> empty problems
    return jnp.asarray(boxes), jnp.asarray(scores)


def main() -> None:
    assert jax.devices()[0].platform != "cpu", (
        "this check must run on the real TPU (compiled Mosaic kernel)")
    rng = np.random.default_rng(0)
    iou_t, score_t = 0.55, 0.001
    ref = jax.jit(jax.vmap(lambda b, s: nms_mask(b, s, iou_t, score_t)))
    ker = jax.jit(lambda b, s: nms_keep_batch(b, s, iou_t, score_t))

    total = 0
    for kind in ("uniform", "clustered", "duplicates", "ties", "empty"):
        for p, k in ((512, 300), (1536, 300), (64, 128)):
            boxes, scores = make_case(rng, p, k, kind)
            keep_ref = np.asarray(ref(boxes, scores))
            keep_ker = np.asarray(ker(boxes, scores))
            eq = np.array_equal(keep_ref, keep_ker)
            n_keep = int(keep_ref.sum())
            print(f"{kind:>10} p={p:<5} k={k:<4} kept={n_keep:<7} "
                  f"{'OK' if eq else 'MISMATCH'}")
            if not eq:
                d = np.argwhere(keep_ref != keep_ker)
                print("first diffs:", d[:5])
                sys.exit(1)
            total += 1
    print(f"COMPILED-KERNEL EXACTNESS OK on {jax.devices()[0]} "
          f"({total} cases, keep sets identical to the XLA reference)")


if __name__ == "__main__":
    main()
