"""Structured training metrics: JSONL file + optional TensorBoard scalars.

The reference's observability is print-only (SURVEY.md §5 "No
TensorBoard/W&B"); this adds a machine-readable metrics stream without
changing the console behavior. Rank-0 only.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

from demonet_tpu.parallel.dist import is_main_process


class MetricsWriter:
    """Append scalar metrics to <dir>/metrics.jsonl (+ tf.summary if
    tensorboard=True and tensorflow is importable)."""

    def __init__(self, output_dir: str, tensorboard: bool = False):
        self.enabled = is_main_process()
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._tb = None
        if not self.enabled:
            return
        os.makedirs(output_dir, exist_ok=True)
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(output_dir, "tb"))
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float],
              prefix: str = "train") -> None:
        if not self.enabled:
            return
        record = {"step": int(step), "time": time.time(),
                  **{f"{prefix}/{k}": float(v) for k, v in metrics.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(f"{prefix}/{k}", float(v), step=step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
