"""Console observability: smoothed meters + the iteration logger.

Capability parity with reference demonet/util/misc.py:
  * SmoothedValue (:13-72) — windowed median/avg, global avg/max, cross-rank
    synchronize_between_processes (:31-42) done with array all-gather instead
    of NCCL tensor ops.
  * MetricLogger (:145-233) — `log_every` with ETA, iter time, data time, and
    device memory stats where the backend exposes them (the CUDA
    max_memory_allocated print at :221 becomes jax device memory_stats).
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Iterable, Optional

import numpy as np
import jax

from demonet_tpu.parallel.dist import all_gather_arrays, process_count


class SmoothedValue:
    """Track a series of values; report window median/avg + global stats."""

    def __init__(self, window_size: int = 20, fmt: Optional[str] = None):
        if fmt is None:
            fmt = "{median:.4f} ({global_avg:.4f})"
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """Sum count/total across processes (misc.py:31-42)."""
        if process_count() == 1:
            return
        t = all_gather_arrays(np.asarray([self.count, self.total], np.float64))
        agg = t.sum(axis=0)
        self.count = int(agg[0])
        self.total = float(agg[1])

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return float(max(self.deque)) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value)


def _device_mem_mb() -> Optional[float]:
    """Peak device memory in MB if the backend exposes stats (TPU does)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / (1024.0 * 1024.0)
    except Exception:
        pass
    return None


class MetricLogger:
    """Iteration logger with ETA and timing meters (misc.py:145-233)."""

    def __init__(self, delimiter: str = "\t"):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(
            f"'{type(self).__name__}' object has no attribute '{attr}'")

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def synchronize_between_processes(self):
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "", pre_print=None):
        """Yield items, printing smoothed meters every print_freq.

        pre_print: optional zero-arg callable invoked right before each
        print (and before the final summary) — the train loop uses it to
        drain asynchronously-dispatched device metrics into the meters so
        printed values are current without per-step host syncs.
        """
        i = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)
        except TypeError:
            total = None
        space = len(str(total)) if total else 6

        from demonet_tpu.parallel.dist import is_main_process

        # rank-0-only printing (reference setup_for_distributed,
        # misc.py:258-270)
        main = is_main_process()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total and i == total - 1):
                if pre_print is not None:
                    pre_print()
            if main and (i % print_freq == 0 or (total and i == total - 1)):
                if total:
                    eta_seconds = iter_time.global_avg * (total - i)
                    eta = str(datetime.timedelta(seconds=int(eta_seconds)))
                else:
                    eta = "?"
                mem = _device_mem_mb()
                mem_str = f"  mem: {mem:.0f}MB" if mem is not None else ""
                count = f"[{i:{space}d}/{total}]" if total else f"[{i}]"
                print(self.delimiter.join([
                    header, count, f"eta: {eta}", str(self),
                    f"time: {iter_time}", f"data: {data_time}"]) + mem_str)
            i += 1
            end = time.time()

        elapsed = time.time() - start_time
        per_it = elapsed / max(i, 1)
        if main:
            print(f"{header} Total time: "
                  f"{str(datetime.timedelta(seconds=int(elapsed)))} "
                  f"({per_it:.4f} s / it)")
