"""Profiling and numerics-debugging helpers.

The reference's only instrumentation is wall-clock ETA printing
(side2side_model.py:14-25). TPU-native equivalents (SURVEY.md §5):
  - jax.profiler trace capture around training sections
  - blocked step timing (block_until_ready so device time is measured)
  - NaN checking via jax_debug_nans as the moral equivalent of a sanitizer
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable jax_debug_nans within a scope (raises on first NaN output)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class StepTimer:
    """Blocked wall-clock timing of device steps.

    `block_on` should be a small output of the step (e.g. a loss scalar);
    fetching it forces the dependency chain — block_until_ready alone can be
    unreliable on tunneled backends.
    """

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, block_on=None):
        if block_on is not None:
            jax.tree.map(
                lambda x: float(x.reshape(-1)[0]) if hasattr(x, "reshape") else x,
                block_on,
            )
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def summary(self, batch_size: int) -> dict:
        if not self.times:
            return {}
        mean = self.mean
        return {
            "mean_step_seconds": mean,
            "steps_per_second": 1.0 / mean,
            "images_per_second": batch_size / mean,
        }
