"""Profiling / step-timing utilities.

The reference's only profiling was wall-clock data/batch times in the train
log (training/train.py:183,264) and the deploy latency harness. TPU-native
additions:

* ``trace(logdir)`` — context manager around ``jax.profiler`` trace capture
  (open in XProf/TensorBoard);
* ``StepTimer`` — rolling data-time / step-time / throughput stats for train
  loops;
* ``device_sync`` — a reliable cross-backend sync point (consumes an fp32
  scalar; ``block_until_ready`` is a no-op on some tunneled platforms).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(x: Optional[jax.Array] = None) -> float:
    """Force completion of outstanding work; returns the consumed scalar."""
    if x is None:
        x = jnp.zeros(())
    return float(jnp.sum(x).astype(jnp.float32))


class StepTimer:
    """Rolling step/data-time tracker for train loops."""

    def __init__(self, window: int = 50):
        self.step_times = deque(maxlen=window)
        self.data_times = deque(maxlen=window)
        self._t = time.perf_counter()

    def data_ready(self):
        now = time.perf_counter()
        self.data_times.append(now - self._t)
        self._t = now

    def step_done(self, n_samples: int = 0):
        now = time.perf_counter()
        self.step_times.append(now - self._t)
        self._t = now
        self._last_n = n_samples

    @property
    def step_time(self) -> float:
        return sum(self.step_times) / max(len(self.step_times), 1)

    @property
    def data_time(self) -> float:
        return sum(self.data_times) / max(len(self.data_times), 1)

    def samples_per_sec(self, n_samples: int) -> float:
        st = self.step_time
        return n_samples / st if st else 0.0
