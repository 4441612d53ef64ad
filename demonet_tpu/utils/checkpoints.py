"""Checkpoint save/restore (Orbax), epoch-granular like the reference.

Reference behavior (train.py:173-178, :191-198; util/misc.py:297-299):
  * per-epoch checkpoint of {model, optimizer, lr_scheduler, args, epoch}
  * rank-0-only writes
  * --resume restores everything and continues at epoch+1

Here one checkpoint = the full TrainState (params, opt_state, BN stats,
step) + a metadata dict. Orbax handles atomicity and async write; process-0
gating matches save_on_master.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from demonet_tpu.parallel.dist import is_main_process


def save_checkpoint(
    output_dir: str,
    state: Any,
    epoch: int,
    metadata: Optional[Dict] = None,
) -> str:
    """Write checkpoint_<epoch>/ under output_dir (rank-0 only)."""
    path = os.path.join(os.path.abspath(output_dir), f"checkpoint_{epoch}")
    if not is_main_process():
        return path
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"state": state}, force=True)
    ckptr.wait_until_finished()
    with open(path + ".meta.json", "w") as f:
        json.dump({"epoch": epoch, "metadata": metadata or {}}, f)
    return path


def load_checkpoint(path: str, abstract_state: Any) -> Tuple[Any, int, Dict]:
    """Restore (state, epoch, metadata). `abstract_state` provides the tree
    structure/shapes (e.g. a freshly created TrainState)."""
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), {"state": abstract_state})
    meta_path = path + ".meta.json"
    epoch, metadata = 0, {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            side = json.load(f)
        epoch, metadata = int(side.get("epoch", 0)), side.get("metadata", {})
    return restored["state"], epoch, metadata


def load_variables(path: str) -> Dict[str, Any]:
    """Restore only inference variables {params, batch_stats} from a
    training checkpoint, independent of the optimizer it was trained with.

    The inference CLIs (predict/export/hub/eval_voc) must accept checkpoints
    from ANY training configuration; a structural TrainState restore would
    require reconstructing the exact optax tree (momentum/weight-decay/
    masked), so restore the raw pytree and keep the model subtrees.
    """
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path))["state"]
    return {"params": state["params"],
            "batch_stats": state.get("batch_stats") or {}}


def load_npz_variables(path: str) -> Dict[str, Any]:
    """Flat .npz variables ('params/.../kernel' keys, the
    tools/export_bench_weights.py layout) -> nested
    {'params': ..., 'batch_stats': ...} with fp32 leaves."""
    import numpy as np

    variables: Dict[str, Any] = {}
    with np.load(path) as z:
        for key in z.files:
            node = variables
            parts = key.split("/")
            for q in parts[:-1]:
                node = node.setdefault(q, {})
            node[parts[-1]] = np.asarray(z[key], np.float32)
    return variables


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Most recent checkpoint_<epoch> directory, or None."""
    if not os.path.isdir(output_dir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(output_dir):
        if name.startswith("checkpoint_"):
            try:
                e = int(name.split("_", 1)[1])
            except ValueError:
                continue
            if e > best_epoch:
                best, best_epoch = os.path.join(output_dir, name), e
    return best
