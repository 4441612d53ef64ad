"""gather_rows_batch (one-hot-matmul gather) must be BIT-identical to
jnp.take_along_axis — interpret mode here (CPU); tools/check_gather_tpu.py
re-asserts on the compiled kernel on real hardware."""

import numpy as np
import jax.numpy as jnp
import pytest

from demonet_tpu.ops.gather_pallas import gather_rows_batch


@pytest.mark.parametrize("b,n,d,r", [
    (3, 3234, 4, 700),     # candidate-gather shape class
    (2, 27000, 4, 300),    # final-gather shape class
    (1, 128, 4, 16),       # single segment
    (2, 129, 2, 5),        # pad + tiny
])
def test_bit_exact_vs_take(b, n, d, r):
    rng = np.random.default_rng(0)
    # adversarial values: huge, tiny, negative, exact powers of two
    vals = rng.random((b, n, d)).astype(np.float32)
    vals[0, 0] = [1e30, -1e-30, 3.14159274, 2.0 ** -20][:d]
    table = jnp.asarray(vals * 640.0 - 320.0)
    idx = jnp.asarray(rng.integers(0, n, (b, r)), jnp.int32)
    out = gather_rows_batch(table, idx, chunk=256, interpret=True)
    want = jnp.take_along_axis(table, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_coord_major_layout():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.random((2, 300, 4), np.float32))
    idx = jnp.asarray(rng.integers(0, 300, (2, 50)), jnp.int32)
    out = gather_rows_batch(table, idx, chunk=128, coord_major=True,
                            interpret=True)
    want = jnp.take_along_axis(table, idx[..., None], axis=1)
    np.testing.assert_array_equal(
        np.asarray(out), np.transpose(np.asarray(want), (0, 2, 1)))


def test_repeated_and_boundary_indices():
    table = jnp.asarray(
        np.arange(3234 * 4, dtype=np.float32).reshape(1, 3234, 4))
    idx = jnp.asarray([[0, 0, 3233, 3233, 127, 128, 129, 3200]], jnp.int32)
    out = gather_rows_batch(table, idx, chunk=128, interpret=True)
    want = jnp.take_along_axis(table, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_auto_impl_heuristic(monkeypatch):
    """'auto' = pallas only on TPU AND when the gather is expanding or
    near-expanding (2R >= N); the final top-300 gather from a 27k-row
    table must stay on XLA, while the fused-path tier-2048 candidate
    gather (R=2048 from N=3234) routes to pallas (round-5 trace: the
    XLA path cost 3.8 ms of the b128 serving step)."""
    import demonet_tpu.models.detection as det
    import jax

    calls = []

    def fake_pallas(table, idx):
        calls.append("pallas")
        return jnp.take_along_axis(table, idx[..., None], axis=1)

    import demonet_tpu.ops.gather_pallas as gp
    monkeypatch.setattr(gp, "gather_rows_batch", fake_pallas)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    table_small = jnp.zeros((2, 100, 4))
    det._gather_rows(table_small, jnp.zeros((2, 500), jnp.int32), "auto")
    assert calls == ["pallas"]                     # expanding -> pallas
    det._gather_rows(jnp.zeros((2, 3234, 4)),
                     jnp.zeros((2, 2048), jnp.int32), "auto")
    assert calls == ["pallas", "pallas"]           # near-expanding -> pallas
    det._gather_rows(jnp.zeros((2, 27000, 4)),
                     jnp.zeros((2, 300), jnp.int32), "auto")
    assert calls == ["pallas", "pallas"]           # contracting -> xla


def test_postprocess_gather_impl_parity():
    """postprocess_detections(gather_impl='pallas'|'xla') parity on CPU via
    interpret-free path: the xla path must equal take_along_axis too."""
    import jax

    from demonet_tpu.models.detection import _gather_rows

    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.random((4, 500, 4), np.float32))
    idx = jnp.asarray(rng.integers(0, 500, (4, 90)), jnp.int32)
    out = _gather_rows(table, idx, "xla")
    want = jnp.take_along_axis(table, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
