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


def device_step_seconds(timed_fn, steps: int) -> float | None:
    """Seconds/step of actual device occupancy, from a jax.profiler trace.

    The PRIMARY benchmark clock (bench.py, scripts/sweep.py,
    scripts/trace_ops.py): host wall timing through this host's tunneled TPU
    backend has shown +-25% episodes, while summing the trace's leaf
    "XLA Ops" durations counts real device time and is immune to relay
    jitter. Returns None if tracing or the xplane protos are unavailable
    (callers then fall back to marginal-rate wall timing).
    """
    import glob
    import importlib
    import os
    import shutil
    import tempfile

    log_dir = tempfile.mkdtemp(prefix="phg_device_clock_")
    try:
        try:
            jax.profiler.start_trace(log_dir)
            timed_fn(steps)
        finally:
            jax.profiler.stop_trace()

        xplane_pb2 = None
        for mod in (
            "tensorflow.tsl.profiler.protobuf.xplane_pb2",
            "tensorflow.core.profiler.protobuf.xplane_pb2",
            "tsl.profiler.protobuf.xplane_pb2",
        ):
            try:
                xplane_pb2 = importlib.import_module(mod)
                break
            except ImportError:
                continue
        if xplane_pb2 is None:
            return None
        total = 0.0
        found = False
        for path in glob.glob(
            os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True
        ):
            xs = xplane_pb2.XSpace()
            with open(path, "rb") as f:
                xs.ParseFromString(f.read())
            for plane in xs.planes:
                if not plane.name.startswith("/device:TPU"):
                    continue
                meta = plane.event_metadata
                for line in plane.lines:
                    if line.name != "XLA Ops":  # leaf compute ops only
                        continue
                    for ev in line.events:
                        name = meta[ev.metadata_id].name
                        if name.startswith(("%while", "jit_", "%jit")):
                            continue
                        total += ev.duration_ps / 1e12
                        found = True
        return total / steps if found and total > 0 else None
    except Exception:
        return None
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)


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
