"""Multi-step scanned train dispatch (make_train_step steps_per_call=K) and
the uint8 image-transfer path.

The reference dispatches one CUDA-stream step per batch (engine.py:27-48);
on TPU through a remote runtime each dispatch costs ~ms of host latency, so
K optimizer steps run as ONE lax.scan program. These tests pin that the
scanned program is numerically the same training computation and that the
epoch loop's metrics/ordering semantics are unchanged, and that uint8 image
shipping (4x smaller H2D) only quantizes pixels, nothing else.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demonet_tpu.data.loader import DetectionLoader
from demonet_tpu.engine import (
    create_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    train_one_epoch,
)
from demonet_tpu.models import ssdlite320_mobilenet_v3_large
from demonet_tpu.models.detection import preprocess

from tests.test_engine import SyntheticDataset


@pytest.fixture(scope="module")
def setup():
    det = ssdlite320_mobilenet_v3_large(num_classes=4, size=(64, 64))
    ds = SyntheticDataset(n=8, size=64)
    return det, ds


@pytest.fixture(scope="module")
def zero_tx():
    # shared object so jit specializations (keyed on the tx closures'
    # identity inside TrainState) are reused across tests
    return make_optimizer(0.0, momentum=0.0, weight_decay=0.0)


@pytest.fixture(scope="module")
def programs(setup):
    det, _ = setup
    # shared across tests: jit caches by function identity, so building
    # these once keeps the suite to two train-program compiles
    return (make_train_step(det, donate=False),
            make_train_step(det, donate=False, steps_per_call=3))


def _batches(ds, n, batch_size=2):
    loader = DetectionLoader(ds, batch_size=batch_size, image_size=(64, 64),
                             max_gt=5, prefetch=0, shuffle=True)
    out = []
    epoch = 0
    while len(out) < n:
        loader.set_epoch(epoch)
        for b in loader:
            out.append({k: b[k] for k in
                        ("images", "gt_boxes", "gt_labels", "gt_valid")})
            if len(out) == n:
                break
        epoch += 1
    return out


def test_scanned_steps_match_sequential(setup, programs):
    det, ds = setup
    single, multi = programs
    batches = _batches(ds, 3)
    tx = make_optimizer(0.01, momentum=0.9, weight_decay=1e-4)

    state_a = create_train_state(det, jax.random.PRNGKey(0), tx)
    seq_metrics = []
    for b in batches:
        state_a, m = single(state_a, b)
        seq_metrics.append(jax.device_get(m))

    state_b = create_train_state(det, jax.random.PRNGKey(0), tx)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    state_b, metrics = multi(state_b, stacked)

    # per-substep metrics come back stacked, in order
    assert metrics["loss"].shape == (3,)
    # substep 0 consumes the identical state -> identical loss (pins that
    # the scan runs the same per-step computation on the right batch)
    assert float(metrics["loss"][0]) == float(seq_metrics[0]["loss"])
    # later substeps only agree loosely: XLA rounds the optimizer-update
    # fusions differently in the scan body, and a training trajectory
    # amplifies ulp-level differences step over step (the tight
    # no-chaos check is test_scanned_zero_lr_matches_tightly). The loose
    # bound still catches wiring bugs (wrong batch order => wholly
    # different losses).
    for i, m in enumerate(seq_metrics):
        np.testing.assert_allclose(float(metrics["loss"][i]),
                                   float(m["loss"]), rtol=2e-2)
    assert int(state_b.step) == int(state_a.step) == 3

    # and the scanned program itself is deterministic: same inputs, same
    # bits
    state_c = create_train_state(det, jax.random.PRNGKey(0), tx)
    state_c, metrics_c = multi(state_c, stacked)
    np.testing.assert_array_equal(np.asarray(metrics["loss"]),
                                  np.asarray(metrics_c["loss"]))
    for pb, pc in zip(jax.tree_util.tree_leaves(state_b.params),
                      jax.tree_util.tree_leaves(state_c.params)):
        np.testing.assert_array_equal(np.asarray(pb), np.asarray(pc))


def test_scanned_zero_lr_matches_tightly(setup, programs, zero_tx):
    """With lr=0 (and no momentum/decay) params never move, so EVERY
    substep's loss must match the sequential path tightly — no trajectory
    chaos, just program-rounding. This pins per-substep batch routing."""
    det, ds = setup
    single, multi = programs
    batches = _batches(ds, 3)
    tx = zero_tx

    state_a = create_train_state(det, jax.random.PRNGKey(2), tx)
    seq = []
    for b in batches:
        state_a, m = single(state_a, b)
        seq.append(float(m["loss"]))

    state_b = create_train_state(det, jax.random.PRNGKey(2), tx)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    _, metrics = multi(state_b, stacked)
    np.testing.assert_allclose(
        np.asarray(metrics["loss"], np.float64), np.asarray(seq),
        rtol=1e-5)
    # distinct batches must give distinct losses (otherwise the routing
    # check above would be vacuous)
    assert len({round(v, 6) for v in seq}) == 3


class _Writer:
    def __init__(self):
        self.rows = []

    def write(self, step, scalars):
        self.rows.append((step, scalars))

    def flush(self):
        pass


def test_epoch_loop_with_multistep_tail_and_metrics(setup, programs,
                                                    zero_tx):
    """7 batches through K=3 windows = 2 scanned dispatches + 1 tail step;
    the writer sees 7 consecutive step numbers with per-step losses/lrs
    matching the plain loop. Zero-lr optimizer so the two trajectories are
    identical (not chaotic) while the schedule still exercises lr logging;
    the loop mechanics under a real optimizer are covered by
    test_scanned_steps_match_sequential."""
    det, ds = setup
    single, multi = programs

    class _FixedLoader:
        def __init__(self, batches):
            self.batches = batches

        def __iter__(self):
            return iter(self.batches)

        def __len__(self):
            return len(self.batches)

    batches = _batches(ds, 7)
    tx = zero_tx
    schedule = make_lr_schedule(0.01, steps_per_epoch=7)

    state0 = create_train_state(det, jax.random.PRNGKey(1), tx)
    w_plain = _Writer()
    state_plain = train_one_epoch(
        single, state0, _FixedLoader(batches), epoch=0, print_freq=100,
        lr_schedule=schedule, metrics_writer=w_plain)

    state0 = create_train_state(det, jax.random.PRNGKey(1), tx)
    w_multi = _Writer()
    state_multi = train_one_epoch(
        single, state0, _FixedLoader(batches), epoch=0, print_freq=100,
        lr_schedule=schedule, metrics_writer=w_multi,
        multi_step=multi, steps_per_call=3)

    assert [s for s, _ in w_multi.rows] == [s for s, _ in w_plain.rows]
    assert len(w_multi.rows) == 7
    # zero-lr => identical parameters at every step, so per-step losses
    # agree tightly (only scan-vs-unrolled program rounding remains)
    for (_, a), (_, b) in zip(w_plain.rows, w_multi.rows):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-5)
        np.testing.assert_allclose(a["lr"], b["lr"], rtol=1e-6)
    assert int(state_multi.step) == int(state_plain.step) == 7


def test_sharded_multistep(setup):
    det, ds = setup
    from demonet_tpu.parallel.mesh import data_mesh, replicate, shard_batch

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = data_mesh()
    tx = make_optimizer(0.01)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    state = jax.device_put(state, replicate(mesh))
    batches = _batches(ds, 2, batch_size=8)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    sharded = shard_batch(stacked, mesh, axis=1)
    # K axis replicated, batch axis split over the 8-device data axis
    assert len(sharded["images"].sharding.device_set) == 8
    multi = make_train_step(det, mesh=mesh, donate=False, steps_per_call=2)
    new_state, metrics = multi(state, sharded)
    assert metrics["loss"].shape == (2,)
    assert np.isfinite(jax.device_get(metrics["loss"])).all()
    assert int(new_state.step) == 2


def test_uint8_loader_and_preprocess(setup):
    det, ds = setup
    lf = DetectionLoader(ds, batch_size=4, image_size=(64, 64), max_gt=5,
                         prefetch=0)
    lu = DetectionLoader(ds, batch_size=4, image_size=(64, 64), max_gt=5,
                         prefetch=0, image_dtype="uint8")
    bf, bu = next(iter(lf)), next(iter(lu))
    assert bu["images"].dtype == np.uint8
    np.testing.assert_array_equal(
        bu["images"],
        np.clip(np.rint(bf["images"] * 255.0), 0, 255).astype(np.uint8))
    # non-image fields identical
    for k in ("gt_boxes", "gt_labels", "gt_valid", "image_ids"):
        np.testing.assert_array_equal(bf[k], bu[k])
    # device-side rescale: quantization error bounded by 0.5/255 per channel
    # before the mean/std affine
    pf = np.asarray(preprocess(jnp.asarray(bf["images"]), det.config,
                               resize=False))
    pu = np.asarray(preprocess(jnp.asarray(bu["images"]), det.config,
                               resize=False))
    tol = (0.5 / 255.0) / min(det.config.image_std) + 1e-6
    assert np.abs(pf - pu).max() <= tol


def test_uint8_pool_path_matches_thread_path(setup):
    _, ds = setup
    kw = dict(batch_size=4, image_size=(64, 64), max_gt=5,
              image_dtype="uint8")
    thread = list(DetectionLoader(ds, prefetch=0, **kw))
    pool = list(DetectionLoader(ds, num_workers=2, **kw))
    assert len(thread) == len(pool)
    for a, b in zip(thread, pool):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])


def test_uint8_train_step_runs(setup):
    det, ds = setup
    loader = DetectionLoader(ds, batch_size=4, image_size=(64, 64), max_gt=5,
                             prefetch=0, image_dtype="uint8")
    b = next(iter(loader))
    batch = {k: b[k] for k in
             ("images", "gt_boxes", "gt_labels", "gt_valid")}
    tx = make_optimizer(0.01)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    step = make_train_step(det, donate=False)
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
