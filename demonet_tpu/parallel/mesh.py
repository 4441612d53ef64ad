"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's DistributedDataParallel wrap
and DistributedSampler (train.py:123-128, :162-164): a 1-D "data" mesh over
all devices; batches are sharded on their leading axis; parameters and
optimizer state are replicated. Gradient averaging is implicit — XLA inserts
the all-reduce (over ICI) when a jitted step consumes a batch-sharded input
and produces replicated parameter updates.

A second, optional "model" axis is plumbed through so larger backbones can
shard channels/feature maps (tensor parallelism) without API changes; SSD's
models are small enough that data parallelism is the profitable layout
(SURVEY.md §2c notes TP/PP are absent from the reference too).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_axis: int = 1,
) -> Mesh:
    """A ("data", "model") mesh; model_axis=1 gives pure data parallelism."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state, anchors)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: int = 0) -> Any:
    """Device-put a pytree of host arrays with batch-axis sharding.

    Single-process: a plain device_put. Multi-process: each host holds only
    its LOCAL batch rows (the loader shards by process), so the global array
    is assembled with make_array_from_process_local_data — the analogue of
    DDP's per-rank batches feeding one logical step.

    axis selects which dimension is the batch axis (axis=1 for the
    K-stacked multi-step windows of make_train_step(steps_per_call=K))."""
    if axis == 0:
        sharding = batch_sharding(mesh)
    else:
        sharding = NamedSharding(mesh, P(*([None] * axis), "data"))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def host_local_values(tree: Any) -> Any:
    """Fetch the process-local rows of batch-sharded global arrays as numpy
    (inverse of shard_batch; device_get would fail on non-addressable
    shards in multi-process runs)."""
    if jax.process_count() == 1:
        return jax.device_get(tree)

    def fetch(arr):
        if not isinstance(arr, jax.Array):
            return np.asarray(arr)
        if arr.is_fully_replicated:
            return np.asarray(arr)
        if arr.ndim == 0:
            # non-replicated scalar: every addressable shard holds the
            # whole value (0-d arrays cannot be concatenated)
            return np.asarray(arr.addressable_shards[0].data)
        shards = sorted(arr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    return jax.tree_util.tree_map(fetch, tree)
