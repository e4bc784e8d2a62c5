"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock `time.time()` around
whole runs and progress prints (/root/reference/src/multi_gpu_train.py:
322-325, SURVEY.md section 5). Here:

  * `trace(dir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable XLA trace (op-level device timeline)
  * `StepTimer` — rolling images/sec + step-latency meter that syncs
    only when read
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: with trace('/tmp/trace'): ...steps..."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput meter.

    mark() after each step; read images_per_sec()/ms_per_step() at log
    points. Uses a window so LR drops / compile stalls age out.
    """

    def __init__(self, batch_size: int, window: int = 100):
        self.batch_size = batch_size
        self._times: deque = deque(maxlen=window + 1)

    def mark(self) -> None:
        self._times.append(time.perf_counter())

    def ms_per_step(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        span = self._times[-1] - self._times[0]
        return 1000.0 * span / (len(self._times) - 1)

    def images_per_sec(self) -> Optional[float]:
        ms = self.ms_per_step()
        return None if ms is None else 1000.0 * self.batch_size / ms
