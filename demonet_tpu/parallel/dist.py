"""Multi-host bootstrap + process utilities.

Replaces the reference's `init_distributed_mode` / rank plumbing
(demonet/util/misc.py:258-324):
  * NCCL process-group init (misc.py:318-323)  -> jax.distributed.initialize
  * RANK/WORLD_SIZE/LOCAL_RANK env + SLURM     -> handled by JAX's own
    coordinator discovery (env:// equivalent built in)
  * rank-0 print gating (misc.py:258-270)      -> is_main_process()
  * dist.barrier (misc.py:323)                 -> sync_devices()
  * pickle-based all_gather (misc.py:75-115)   -> array-based
    process_allgather (fixed-size arrays, no pickle round-trip)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap. No-op for single-process runs.

    Mirrors init_distributed_mode's "not distributed -> return" behavior
    (misc.py:310-315): if neither args nor launcher env vars are present,
    single-process mode is assumed.
    """
    has_env = any(k in os.environ for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and num_processes is None and not has_env:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Rank gate for printing/checkpointing (misc.py:293-299)."""
    return jax.process_index() == 0


def sync_devices(name: str = "barrier") -> None:
    """Global barrier (misc.py:323 dist.barrier equivalent)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def all_gather_arrays(x: np.ndarray) -> np.ndarray:
    """Gather a same-shape host array from every process; returns
    (num_processes, *shape). Array-native replacement for the reference's
    pickle→ByteTensor→NCCL all_gather (misc.py:75-115)."""
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))
