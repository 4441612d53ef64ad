"""Jitted SPMD train step + epoch loop.

Reference: engine.train_one_epoch (demonet/engine.py:14-56). Differences are
the TPU-native ones: the whole step (forward, matching, loss, backward, SGD
update, BN stat update) is ONE jitted SPMD program; gradient averaging across
the data mesh is XLA's all-reduce instead of DDP hooks; the non-finite-loss
abort (engine.py:41-44) happens on the host from the step's scalar outputs.
"""

from __future__ import annotations

import math
import sys
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from demonet_tpu.models.detection import Detector, preprocess
from demonet_tpu.models.losses import multibox_loss
from demonet_tpu.engine.state import TrainState
from demonet_tpu.utils.logging import MetricLogger, SmoothedValue


def make_train_step(
    detector: Detector,
    mesh: Optional[Mesh] = None,
    normalize_in_step: bool = True,
    donate: bool = True,
    remat: bool = False,
    steps_per_call: int = 1,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Build the jitted train step.

    Batch dict: images (B, H, W, 3) float [0,1] (or uint8, normalized
    on device); gt_boxes (B, G, 4); gt_labels (B, G); gt_valid (B, G).

    With a mesh, inputs are batch-sharded over the "data" axis and the state
    is replicated; XLA inserts the gradient all-reduce over ICI.

    steps_per_call > 1 returns a MULTI-STEP program: the batch dict gains a
    leading K axis and the step runs as one `lax.scan` over it — K optimizer
    updates per dispatch. Per-step host dispatch through a remote/tunneled
    runtime costs several ms that the reference never sees (its CUDA stream
    queues kernels asynchronously); scanning K steps amortizes that to ~0
    while keeping per-substep metrics (stacked with a leading K axis).
    """
    anchors = jnp.asarray(detector.anchors)
    config = detector.config

    def _apply_train(variables, images):
        return detector.model.apply(
            variables, images, train=True, mutable=["batch_stats"])

    # remat trades FLOPs for HBM: rematerialize activations in the backward
    # pass (jax.checkpoint) so batch sizes can grow past HBM limits
    apply_fn = jax.checkpoint(_apply_train) if remat else _apply_train

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        images = batch["images"]
        if normalize_in_step:
            images = preprocess(images, config, resize=False)

        def loss_fn(params):
            outputs, mutated = apply_fn(
                {"params": params, "batch_stats": state.batch_stats}, images)
            losses = multibox_loss(
                outputs["cls_logits"], outputs["bbox_regression"], anchors,
                batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"],
                iou_thresh=config.iou_thresh,
                neg_to_pos_ratio=config.neg_to_pos_ratio,
                box_coder_weights=config.box_coder_weights)
            total = losses["bbox_regression"] + losses["classification"]
            return total, (losses, mutated["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=new_stats)
        metrics = dict(losses)
        metrics["loss"] = total
        return new_state, metrics

    if steps_per_call > 1:
        def multi(state: TrainState, batches: Dict[str, jnp.ndarray]):
            # batches: every leaf has a leading steps_per_call axis
            return jax.lax.scan(step, state, batches)
        fn, batch_spec = multi, P(None, "data")
    else:
        fn, batch_spec = step, P("data")

    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,) if donate else ())

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, batch_spec)
    return jax.jit(
        fn,
        in_shardings=(replicated, sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def train_one_epoch(
    train_step: Callable,
    state: TrainState,
    data_loader,
    epoch: int,
    print_freq: int = 20,
    lr_schedule: Optional[Callable] = None,
    mesh: Optional[Mesh] = None,
    metrics_writer=None,
    multi_step: Optional[Callable] = None,
    steps_per_call: int = 1,
) -> TrainState:
    """Epoch loop with MetricLogger output (reference engine.py:14-56).

    Aborts (sys.exit(1)) on non-finite loss like the reference
    (engine.py:41-44).

    With multi_step (a make_train_step(..., steps_per_call=K) program),
    batches are accumulated in windows of K, stacked on the host, and run
    as ONE device dispatch; the short tail of the epoch falls back to
    train_step. Per-substep metrics/abort/writer semantics are unchanged.
    """
    logger = MetricLogger(delimiter="  ")
    logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
    header = f"Epoch: [{epoch}]"

    # Deferred metric readback: `float(metrics["loss"])` every step blocks
    # the host on the device and serializes dispatch (the reference's
    # per-step finite check, engine.py:41-44, is free on GPU+CUDA streams
    # but forfeits async pipelining on TPU). We keep the device arrays and
    # materialize them every `print_freq` steps — by then the transfers
    # are long complete, so the drain is ~free and dispatch stays ahead.
    # Abort semantics are preserved: a non-finite loss still exits with
    # that exact step's metrics, at most print_freq-1 steps later.
    step0 = int(state.step)  # one host sync before the loop
    # [(step_numbers, device_metrics)] — metrics leaves carry a leading
    # len(step_numbers) axis when that list has more than one entry
    pending = []

    def _drain():
        if not pending:
            return
        flat_steps = [s for steps, _ in pending for s in steps]
        # one device call + one transfer for the whole window
        if lr_schedule is not None:
            lrs = jax.device_get(lr_schedule(jnp.asarray(flat_steps)))
            lrs = [float(v) for v in jnp.reshape(lrs, (-1,))]
        else:
            lrs = [0.0] * len(flat_steps)
        fetched = jax.device_get([m for _, m in pending])
        rows = []
        for (steps, _), m in zip(pending, fetched):
            if len(steps) == 1:
                rows.append({k: float(v) for k, v in m.items()})
            else:
                for i in range(len(steps)):
                    rows.append({k: float(v[i]) for k, v in m.items()})
        pending.clear()
        for step_no, lr, scalars in zip(flat_steps, lrs, rows):
            loss_value = scalars["loss"]
            if not math.isfinite(loss_value):
                print(f"Loss is {loss_value}, stopping training")
                print(scalars)
                sys.exit(1)
            logger.update(lr=lr, **scalars)
            if metrics_writer is not None:
                metrics_writer.write(step_no, dict(scalars, lr=lr))

    if mesh is not None:
        from demonet_tpu.parallel.mesh import shard_batch

    k = steps_per_call if multi_step is not None else 1
    window = []

    def _run_window():
        nonlocal state, step0
        if not window:
            return
        if len(window) == k and k > 1:
            import numpy as np

            stacked = {key: np.stack([b[key] for b in window])
                       for key in window[0]}
            if mesh is not None:
                stacked = shard_batch(stacked, mesh, axis=1)
            state, metrics = multi_step(state, stacked)
            pending.append((list(range(step0 + 1, step0 + 1 + k)), metrics))
            step0 += k
        else:  # single-step program (k == 1) or the epoch's short tail
            for b in window:
                if mesh is not None:
                    b = shard_batch(b, mesh)
                state, metrics = train_step(state, b)
                step0 += 1
                pending.append(([step0], metrics))
        window.clear()

    for batch in logger.log_every(data_loader, print_freq, header,
                                  pre_print=_drain):
        window.append(batch)
        if len(window) == k:
            _run_window()

    _run_window()
    _drain()
    if metrics_writer is not None:
        metrics_writer.flush()
    return state
