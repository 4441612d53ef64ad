"""The epoch-loop function itself (engine.train_one_epoch): runs batches
through the jitted step, logs, returns the advanced state; and the full
train->save->resume->eval cycle at tiny scale."""

import numpy as np
import jax

from demonet_tpu.data.loader import DetectionLoader
from demonet_tpu.engine import (
    create_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    train_one_epoch,
)
from demonet_tpu.models import ssdlite320_mobilenet_v3_large
from tests.test_engine import SyntheticDataset


def test_train_one_epoch_advances_state(capsys):
    det = ssdlite320_mobilenet_v3_large(num_classes=4, size=(64, 64))
    ds = SyntheticDataset(n=4, size=64)
    loader = DetectionLoader(ds, batch_size=2, image_size=(64, 64),
                             max_gt=5, prefetch=0)

    schedule = make_lr_schedule(0.01, steps_per_epoch=len(loader))
    tx = make_optimizer(schedule)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    step = make_train_step(det, donate=False)

    def filtered(loader):
        for b in loader:
            yield {k: v for k, v in b.items()
                   if k in ("images", "gt_boxes", "gt_labels", "gt_valid")}

    state = train_one_epoch(step, state, list(filtered(loader)), epoch=0,
                            print_freq=1, lr_schedule=schedule)
    assert int(state.step) == len(loader)
    out = capsys.readouterr().out
    assert "Epoch: [0]" in out and "loss" in out and "lr" in out
    # warmup semantics (reference warmup_lr_scheduler, misc.py:239-247):
    # with a long epoch, lr at step 1 is ~base/1000; milestones decay by 0.1
    long = make_lr_schedule(0.02, steps_per_epoch=2000, milestones=[1, 2])
    assert float(long(1)) < 0.02 / 100          # deep in warmup
    assert abs(float(long(1999)) - 0.02) < 1e-6  # end of epoch 0
    assert abs(float(long(2000)) - 0.002) < 1e-6  # decay at epoch 1
    assert abs(float(long(4100)) - 0.0002) < 1e-7  # second decay


def test_train_one_epoch_defers_metric_readback_and_aborts(capsys):
    """Round-3 async dispatch: per-step metrics are NOT synced every step
    (host reads happen at print boundaries), yet a non-finite loss still
    aborts via sys.exit(1) with that step's metrics (reference
    engine.py:41-44 semantics)."""
    import math

    import jax.numpy as jnp
    import pytest

    from demonet_tpu.engine.state import TrainState
    import optax

    class _FakeState:
        step = 0

    reads = []

    class _Loss:
        """Device-array stand-in that records when the host reads it."""

        def __init__(self, v):
            self.v = v

        def __float__(self):
            reads.append(self.v)
            return float(self.v)

    state = _FakeState()

    def fake_step(st, batch):
        st.step += 1
        return st, {"loss": _Loss(batch["v"])}

    batches = [{"v": 1.0}, {"v": 2.0}, {"v": 3.0}, {"v": float("nan")},
               {"v": 5.0}]
    with pytest.raises(SystemExit) as exc:
        train_one_epoch(fake_step, state, batches, epoch=0, print_freq=100)
    assert exc.value.code == 1
    # steps 1-3 drained (finite), the NaN at step 4 triggered the abort;
    # step 5 ran (dispatch stayed ahead) but its metric read came after
    assert math.isnan(reads[3])
    out = capsys.readouterr().out
    assert "stopping training" in out


def test_train_one_epoch_metrics_writer_gets_every_step(capsys):
    class _FakeState:
        step = 10

    state = _FakeState()

    def fake_step(st, batch):
        st.step += 1
        return st, {"loss": float(batch["v"])}

    written = []

    class _Writer:
        def write(self, step, scalars):
            written.append((step, dict(scalars)))

        def flush(self):
            pass

    batches = [{"v": float(i)} for i in range(7)]
    train_one_epoch(fake_step, state, batches, epoch=0, print_freq=3,
                    metrics_writer=_Writer())
    assert [s for s, _ in written] == [11, 12, 13, 14, 15, 16, 17]
    assert [w["loss"] for _, w in written] == [float(i) for i in range(7)]
    assert all(w["lr"] == 0.0 for _, w in written)
