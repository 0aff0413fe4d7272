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
        total = parse_trace_device_seconds(log_dir, xplane_pb2)
        if total is None:
            return None
        return total / steps if total > 0 else None
    except Exception:
        return None
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)


def parse_trace_device_seconds(log_dir: str, xplane_pb2) -> float | None:
    """Device seconds of the slowest TPU plane in a profiler trace dir.

    Per-plane totals: with DP over ndev devices each plane's op sum is
    ~one full step of device time running CONCURRENTLY with the others,
    so summing planes would report ~ndev x the true step time. The step's
    device occupancy is the slowest plane (devices run the same SPMD
    program in lockstep between collectives).
    """
    import glob
    import os

    per_plane: dict = {}
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
                    per_plane[plane.name] = (
                        per_plane.get(plane.name, 0.0)
                        + ev.duration_ps / 1e12
                    )
    if not per_plane:
        return None
    return max(per_plane.values())


def marginal_step_seconds(
    timed_fn, steps: int, tries: int = 3
) -> float | None:
    """Best-of-N host marginal-rate seconds/step: (t_full - t_short)/Δsteps.

    The SECONDARY benchmark clock, used only when `device_step_seconds`
    can't produce a trace. Marginal rate cancels fixed dispatch/fetch
    overhead; best-of-N keeps only positive marginals because tunnel RPC
    latency spikes can make a single difference negative. Returns None when
    every sample is non-positive (callers decide whether to raise or
    record the failure) — one methodology for bench.py, scripts/sweep.py,
    and scripts/bench_infer.py.
    """
    short = max(steps // 4, 1)
    best = float("inf")
    for _ in range(tries):
        t_short = timed_fn(short)
        t_full = timed_fn(steps)
        marginal = (t_full - t_short) / (steps - short)
        if 0 < marginal < best:
            best = marginal
    return None if best == float("inf") else best


def marginal_call_seconds(
    fn, args=(), n_long: int = 16, n_short: int = 4, repeats: int = 3
) -> float:
    """Best-of marginal seconds per `fn(*args)` call, forcing a host fetch.

    The per-call analogue of `marginal_step_seconds` for micro-benchmarks
    over a jitted function instead of a scan chunk: run n_short and n_long
    back-to-back calls, fetch one scalar of the output to force the chain
    (block_until_ready lies through the tunnel), and keep the best positive
    (t_long - t_short) / (n_long - n_short). ONE copy of this methodology —
    scripts/profile_components.py and scripts/bench_hist_impls.py share it.
    """
    import time

    import jax.numpy as jnp

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        return time.perf_counter() - t0

    run(2)  # compile + warmup
    best = float("inf")
    for _ in range(repeats):
        t_s = run(n_short)
        t_l = run(n_long)
        m = (t_l - t_s) / (n_long - n_short)
        if 0 < m < best:
            best = m
    return best


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
