"""Benchmark-clock unit tests (utils/profiling.py).

The device-trace clock is the repo's primary benchmark methodology
(bench.py / scripts/sweep.py / scripts/bench_infer.py); these pin its two
non-obvious behaviors: per-plane max (not cross-plane sum) on multi-device
traces, and the shared best-of-N marginal fallback's all-negative handling.
"""

import importlib
import os

import pytest

from palette_and_histo_gan_tpu.utils.profiling import (
    marginal_step_seconds,
    parse_trace_device_seconds,
)


def _import_xplane_pb2():
    for mod in (
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",
        "tensorflow.core.profiler.protobuf.xplane_pb2",
        "tsl.profiler.protobuf.xplane_pb2",
    ):
        try:
            return importlib.import_module(mod)
        except ImportError:
            continue
    return None


def _make_plane(xs, name, op_durations_ps, line_name="XLA Ops"):
    plane = xs.planes.add()
    plane.name = name
    line = plane.lines.add()
    line.name = line_name
    for i, (op_name, dur) in enumerate(op_durations_ps):
        plane.event_metadata[i].id = i
        plane.event_metadata[i].name = op_name
        ev = line.events.add()
        ev.metadata_id = i
        ev.duration_ps = dur
    return plane


def test_marginal_step_seconds_linear_timer():
    # timed(n) = 0.5 + 0.01*n  ->  marginal rate exactly 0.01 s/step
    calls = []

    def timed(n):
        calls.append(n)
        return 0.5 + 0.01 * n

    assert marginal_step_seconds(timed, steps=20) == pytest.approx(0.01)
    # best-of-3: three (short, full) pairs
    assert calls == [5, 20] * 3


def test_marginal_step_seconds_all_negative_returns_none():
    # decreasing "times" make every marginal negative (tunnel latency
    # spike pathology) -> None, never a negative or inf rate
    seq = iter([10.0, 5.0, 10.0, 5.0, 10.0, 5.0])
    assert marginal_step_seconds(lambda n: next(seq), steps=20) is None


def test_parse_trace_takes_slowest_plane_not_sum():
    xplane_pb2 = _import_xplane_pb2()
    if xplane_pb2 is None:
        pytest.skip("xplane protos unavailable")
    import tempfile

    xs = xplane_pb2.XSpace()
    # two TPU device planes running concurrently (DP): 10 ms and 12 ms.
    # The step clock must report 12 ms (slowest plane), NOT 22 ms.
    _make_plane(xs, "/device:TPU:0", [("fusion.1", int(4e9)), ("copy.2", int(6e9))])
    _make_plane(xs, "/device:TPU:1", [("fusion.1", int(12e9))])
    # non-compute entries that must be ignored
    _make_plane(xs, "/device:TPU:0 (extra)", [("%while.3", int(99e9)), ("jit_step", int(99e9))])
    _make_plane(xs, "/host:CPU", [("python", int(99e9))])
    _make_plane(xs, "/device:TPU:2", [("fusion.9", int(99e9))], line_name="Steps")

    with tempfile.TemporaryDirectory() as d:
        sub = os.path.join(d, "plugins", "profile", "run1")
        os.makedirs(sub)
        with open(os.path.join(sub, "host.xplane.pb"), "wb") as f:
            f.write(xs.SerializeToString())
        total = parse_trace_device_seconds(d, xplane_pb2)

    assert total == pytest.approx(12e9 / 1e12)


def test_parse_trace_empty_dir_returns_none():
    xplane_pb2 = _import_xplane_pb2()
    if xplane_pb2 is None:
        pytest.skip("xplane protos unavailable")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        assert parse_trace_device_seconds(d, xplane_pb2) is None
