"""End-to-end engine tests on a synthetic in-memory dataset: loader batching,
train steps (loss decreases on an overfit mini-set), evaluation loop with the
COCO evaluator, checkpoint save/resume, multi-device sharded step."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demonet_tpu.data.loader import DetectionLoader
from demonet_tpu.engine import (
    create_train_state,
    evaluate,
    make_lr_schedule,
    make_optimizer,
    make_predict_step,
    make_train_step,
)
from demonet_tpu.models import ssdlite320_mobilenet_v3_large


class SyntheticDataset:
    """Deterministic colored-rectangle detection dataset."""

    def __init__(self, n=8, size=64, num_classes=4, seed=0):
        self.n = n
        self.size = size
        self.rng = np.random.RandomState(seed)
        self.samples = []
        for i in range(n):
            img = np.full((size, size, 3), 30, np.uint8)
            x1, y1 = self.rng.randint(2, size // 2, 2)
            w, h = self.rng.randint(10, size // 2 - 2, 2)
            label = int(self.rng.randint(1, num_classes))
            img[y1:y1 + h, x1:x1 + w] = [200, 50 * label % 255, 100]
            self.samples.append((img, {
                "boxes": np.asarray([[x1, y1, x1 + w, y1 + h]], np.float32),
                "labels": np.asarray([label], np.int64),
                "image_id": i,
                "orig_size": (size, size),
            }))

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        img, t = self.samples[idx]
        return img.astype(np.float32) / 255.0, t

    def ground_truth_for_eval(self):
        return [{"image_id": t["image_id"], "boxes": t["boxes"],
                 "labels": t["labels"]} for _, t in self.samples]


@pytest.fixture(scope="module")
def setup():
    det = ssdlite320_mobilenet_v3_large(num_classes=4, size=(64, 64))
    ds = SyntheticDataset(n=8, size=64)
    return det, ds


def test_loader_shapes(setup):
    _, ds = setup
    loader = DetectionLoader(ds, batch_size=4, image_size=(64, 64), max_gt=5)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (4, 64, 64, 3)
    assert b["images"].dtype == np.float32
    assert b["gt_boxes"].shape == (4, 5, 4)
    assert b["gt_valid"].sum() == 4  # one box per image
    assert b["batch_valid"].all()


def test_loader_shards_cover_dataset(setup):
    _, ds = setup
    ids = []
    for shard in range(2):
        loader = DetectionLoader(ds, 2, image_size=(64, 64),
                                 num_shards=2, shard_index=shard)
        for b in loader:
            ids.extend(b["image_ids"][b["batch_valid"]].tolist())
    assert sorted(set(ids)) == list(range(8))


def test_train_loss_decreases(setup):
    det, ds = setup
    loader = DetectionLoader(ds, batch_size=8, image_size=(64, 64),
                             max_gt=5, prefetch=0)
    tx = make_optimizer(0.05, momentum=0.9, weight_decay=1e-4)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    step = make_train_step(det, donate=False)
    batch = next(iter(loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("images", "gt_boxes", "gt_labels", "gt_valid")}
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_evaluate_loop_runs(setup):
    det, ds = setup
    from demonet_tpu.data.coco_eval import CocoEvaluator

    loader = DetectionLoader(ds, batch_size=4, image_size=(64, 64), prefetch=0)
    variables = det.init(jax.random.PRNGKey(0))
    predict = make_predict_step(det)
    ev = evaluate(predict, variables, loader, CocoEvaluator(
        ds.ground_truth_for_eval()))
    assert ev.stats is not None and len(ev.stats) == 12


def test_checkpoint_resume(setup, tmp_path):
    det, _ = setup
    from demonet_tpu.utils.checkpoints import (
        latest_checkpoint, load_checkpoint, save_checkpoint)

    tx = make_optimizer(0.01)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    state = state.replace(step=42)
    save_checkpoint(str(tmp_path), jax.device_get(state), epoch=5)
    path = latest_checkpoint(str(tmp_path))
    restored, epoch, _ = load_checkpoint(path, state)
    assert epoch == 5 and int(restored.step) == 42
    old = jax.tree_util.tree_leaves(state.params)[0]
    new = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


def test_load_variables_any_optimizer(setup, tmp_path):
    """Inference-side loads must accept checkpoints from ANY training
    optimizer: a momentum+weight-decay TrainState's opt_state does not
    match the sgd(0.0) abstract tree the CLIs used to build (the bug that
    made predict/export/hub/eval_voc reject real training checkpoints)."""
    det, _ = setup
    from demonet_tpu.utils.checkpoints import load_variables, save_checkpoint

    tx = make_optimizer(make_lr_schedule(0.02, steps_per_epoch=10),
                        momentum=0.9, weight_decay=1e-4)
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    save_checkpoint(str(tmp_path), jax.device_get(state), epoch=0)
    # relative path must work too (CLI users pass runs/... paths)
    rel = os.path.relpath(str(tmp_path / "checkpoint_0"))
    variables = load_variables(rel)
    assert set(variables) == {"params", "batch_stats"}
    old = jax.tree_util.tree_leaves(state.params)[0]
    new = jax.tree_util.tree_leaves(variables["params"])[0]
    np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    # the restored variables drive a forward pass unchanged
    x = jnp.zeros((1,) + tuple(det.config.size) + (3,))
    out = det.model.apply(variables, x, train=False)
    assert np.isfinite(np.asarray(out["cls_logits"])).all()


def test_sharded_train_step(setup):
    det, ds = setup
    from demonet_tpu.parallel.mesh import data_mesh, replicate, shard_batch

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = data_mesh()
    tx = make_optimizer(make_lr_schedule(0.02, steps_per_epoch=10))
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    state = jax.device_put(state, replicate(mesh))
    loader = DetectionLoader(ds, batch_size=8, image_size=(64, 64),
                             max_gt=5, prefetch=0)
    batch = next(iter(loader))
    batch = {k: v for k, v in batch.items()
             if k in ("images", "gt_boxes", "gt_labels", "gt_valid")}
    sharded = shard_batch(batch, mesh)
    step = make_train_step(det, mesh=mesh, donate=False)
    new_state, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["loss"]))
    # params replicated, batch sharded over 8 devices
    assert len(sharded["images"].sharding.device_set) == 8
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 8  # replicated across all


def test_sharded_train_step_matches_unsharded(setup):
    """Numeric DP correctness, not just crash-freedom: one optimizer step
    on the 8-device mesh must reproduce the single-device step on the
    same batch. Tolerances are loose-ish by necessity: GSPMD partitioning
    reorders float reductions, and the MultiBox loss makes DISCRETE
    selections (matching, hard-negative top-k) on those values, so a few
    anchors flip sets and move the loss by ~1e-4 relative (measured) —
    while a real DP bug (per-shard normalization, missing psum) shows up
    at 8x / 12.5%."""
    det, ds = setup
    from demonet_tpu.parallel.mesh import data_mesh, replicate, shard_batch

    tx = make_optimizer(make_lr_schedule(0.02, steps_per_epoch=10))
    loader = DetectionLoader(ds, batch_size=8, image_size=(64, 64),
                             max_gt=5, prefetch=0)
    batch = {k: v for k, v in next(iter(loader)).items()
             if k in ("images", "gt_boxes", "gt_labels", "gt_valid")}

    base_state = create_train_state(det, jax.random.PRNGKey(0), tx)
    solo_state, solo_metrics = make_train_step(det, donate=False)(
        base_state, batch)

    for model_axis in (1, 2):  # pure-DP mesh and the 2-D (data, model) mesh
        mesh = data_mesh(model_axis=model_axis)
        state = jax.device_put(
            create_train_state(det, jax.random.PRNGKey(0), tx),
            replicate(mesh))
        step = make_train_step(det, mesh=mesh, donate=False)
        new_state, metrics = step(state, shard_batch(dict(batch), mesh))
        np.testing.assert_allclose(
            float(metrics["loss"]), float(solo_metrics["loss"]),
            rtol=2e-3, err_msg=f"model_axis={model_axis}")
        solo_leaves = jax.tree_util.tree_leaves(solo_state.params)
        mesh_leaves = jax.tree_util.tree_leaves(new_state.params)
        for a, b in zip(solo_leaves, mesh_leaves):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-4,
                err_msg=f"model_axis={model_axis}")
