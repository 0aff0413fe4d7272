"""Multi-host (multi-process) data-parallel training.

The reference has no distributed story (SURVEY.md §2.3); the build's
multi-host recipe is `parallel.distributed.initialize` -> global mesh ->
the same `make_dp_train_chunk` program, with the gradient all-reduce
riding DCN across hosts (here: Gloo across local CPU processes — JAX's
standard fake-multihost trick).

Asserts the strongest properties available without hardware:
  * a 2-process 4-device chunk produces bitwise the same losses as a
    single-process 4-device run of the identical program (baseline AND
    the histogram variant with the interpret-mode Pallas augmentation
    over shard_map — the flagship's kernel path crossing the process
    boundary);
  * the same holds for a 4-process x 1-device topology;
  * an orbax checkpoint written BY a 2-process run restores in a FRESH
    2-process run with step and params intact (distributed save/restore
    has real coordination semantics — primary-host writes, per-shard
    commits — that single-process mesh tests cannot exercise).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Runs in a fresh interpreter: forces the CPU platform before any backend
# touch (mirrors conftest.py), optionally joins an nprocs-process
# distributed service over 4 global devices, runs the production DP chunk
# on a tiny model, optionally saves to / restores from an orbax checkpoint
# directory shared by all processes, and prints one JSON line of results.
#
# argv: port pid nprocs variant action ckpt_dir
#   action: "train" | "save" (train then checkpoint) | "restore"
# The histogram variant runs augment_impl="pallas" with pallas_call
# patched to interpret mode (no TPU here), exercising the shard_map
# kernel across the process boundary exactly like __graft_entry__ does.
_WORKER = """
import sys
port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
variant, action, ckpt_dir = sys.argv[4], sys.argv[5], sys.argv[6]
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4 // nprocs)
# persistent compilation cache: on the 1-core host, N concurrent workers
# each cold-compiling the chunk skews their finish times past the
# coordination service's shutdown barrier (observed as 'Shutdown barrier
# timed out' with 4 processes in a loaded full-suite run); cached
# executables collapse the skew for retries and re-runs
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, {repo!r})
from palette_and_histo_gan_tpu.parallel import distributed
if nprocs > 1:
    distributed.initialize(f"127.0.0.1:{{port}}", nprocs, pid)
    info = distributed.global_mesh_info()
    assert info["process_count"] == nprocs, info
    assert info["local_devices"] == 4 // nprocs, info
    assert info["global_devices"] == 4, info
    # Form the global Gloo communicator NOW, while initialize() has all
    # processes aligned (its connect is a barrier): Gloo's KV rendezvous
    # has a fixed ~30 s deadline, and the natural first collective only
    # happens after minutes of per-worker trace/compile that the 1-core
    # host serializes — 4-way skew there exceeds the deadline
    # deterministically. The chunk's collectives reuse this context.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("gloo-context-warmup")

import json
import numpy as np
import jax.numpy as jnp
from palette_and_histo_gan_tpu.config import config_for_variant
from palette_and_histo_gan_tpu.parallel import dp as dp_mod
from palette_and_histo_gan_tpu.parallel import mesh as mesh_mod
from palette_and_histo_gan_tpu.train.state import build_models, create_train_state

overrides = {{}}
if variant == "histogram":
    overrides["augment_impl"] = "pallas"
config = config_for_variant(
    variant,
    donate_state=False,
    batch_size=4,
    down_filters=(8,) * 6,
    up_filters=(8,) * 6,
    **overrides,
)
models = build_models(config)
mesh = mesh_mod.make_mesh(jax.devices())
state = mesh_mod.replicate_state(
    mesh, create_train_state(config, models, jax.random.PRNGKey(0))
)
n_data = 16
rng = np.random.default_rng(1)
repl = mesh_mod.replicated(mesh)
dataset = jax.device_put(
    (
        jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 4)), jnp.uint8),
        jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 4)), jnp.uint8),
    ),
    repl,
)

def params_checksum(state):
    # exact (order-fixed f64) content signature of the replicated params,
    # comparable across processes and runs
    total = 0.0
    for leaf in jax.tree.leaves(state.g_params) + jax.tree.leaves(state.d_params):
        total += float(np.abs(np.asarray(leaf, np.float64)).sum())
    return total

out = {{}}
if action == "restore":
    from palette_and_histo_gan_tpu.train import checkpoint as ckpt
    manager = ckpt.make_manager(config.replace(temp_folder=ckpt_dir))
    restored = ckpt.restore(manager, state)
    out["step"] = int(restored.step)
    out["checksum"] = params_checksum(restored)
else:
    chunk = dp_mod.make_dp_train_chunk(config, models, mesh, n_data)
    if variant == "histogram":
        import functools as _ft
        from jax.experimental import pallas as pl
        _orig = pl.pallas_call
        pl.pallas_call = _ft.partial(_orig, interpret=True)
        try:
            new_state, metrics = chunk(state, dataset, jax.random.PRNGKey(2), 3)
        finally:
            pl.pallas_call = _orig
    else:
        new_state, metrics = chunk(state, dataset, jax.random.PRNGKey(2), 3)
    out = {{
        "g": np.asarray(metrics["generator/total_loss"]).tolist(),
        "d": np.asarray(metrics["discriminator/total_loss"]).tolist(),
        "step": int(new_state.step),
    }}
    if action == "save":
        from palette_and_histo_gan_tpu.train import checkpoint as ckpt
        manager = ckpt.make_manager(config.replace(temp_folder=ckpt_dir))
        ckpt.save(manager, new_state)
        manager.wait_until_finished()
        out["checksum"] = params_checksum(new_state)
print("RESULT " + json.dumps(out), flush=True)
""".format(repo=REPO)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_worker(
    port: int,
    pid: int,
    nprocs: int,
    variant: str = "baseline",
    action: str = "train",
    ckpt_dir: str = "",
) -> subprocess.Popen:
    return subprocess.Popen(
        [
            sys.executable, "-c", _WORKER,
            str(port), str(pid), str(nprocs), variant, action, ckpt_dir,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=REPO,
    )


def _result(proc: subprocess.Popen, timeout: int = 540) -> dict:
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"worker failed:\n{err[-3000:]}"
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in worker output:\n{out}\n{err[-2000:]}")


def _fanout(nprocs: int, variant: str = "baseline", action: str = "train",
            ckpt_dir: str = "") -> list[dict]:
    # Gloo's rendezvous has a fixed ~30 s KV-exchange deadline INSIDE the
    # first collective; on this 1-core host a loaded scheduler can delay a
    # peer past it (observed under a concurrent TF training run). That is
    # environment scheduling, not the property under test — retry the
    # whole fanout on that exact signature only.
    for attempt in range(3):
        port = _free_port()
        procs = [
            _run_worker(port, pid, nprocs, variant, action, ckpt_dir)
            for pid in range(nprocs)
        ]
        try:
            return [_result(p) for p in procs]
        except AssertionError as e:
            for p in procs:
                if p.poll() is None:
                    p.kill()
            transient = "DEADLINE_EXCEEDED" in str(e) or "Gloo context" in str(e)
            if attempt == 2 or not transient:
                raise
    raise AssertionError("unreachable")


@pytest.mark.slow
def test_two_process_dp_chunk_matches_single_process():
    results = _fanout(2)

    # both processes observe identical replicated metrics
    assert results[0] == results[1]
    assert results[0]["step"] == 3
    assert np.all(np.isfinite(results[0]["g"]))
    assert np.all(np.isfinite(results[0]["d"]))

    # and the cross-process program computes exactly what one process
    # over the same 4-device mesh computes
    single = _fanout(1)[0]
    np.testing.assert_allclose(results[0]["g"], single["g"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["d"], single["d"], rtol=1e-6)


@pytest.mark.slow
def test_four_process_dp_chunk_matches_single_process():
    """4 processes x 1 device each — every collective crosses a process
    boundary — still computes bitwise what one 4-device process computes."""
    results = _fanout(4)
    assert all(r == results[0] for r in results[1:])
    assert results[0]["step"] == 3
    single = _fanout(1)[0]
    np.testing.assert_allclose(results[0]["g"], single["g"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["d"], single["d"], rtol=1e-6)


@pytest.mark.slow
def test_histogram_pallas_two_process_matches_single():
    """The flagship loss family (histogram) with the shard_map Pallas
    augmentation (interpret mode off-TPU) across 2 processes equals the
    single-process 4-device run — kernel dispatch, histogram loss, and
    gradient all-reduce all cross the DCN boundary."""
    results = _fanout(2, variant="histogram")
    assert results[0] == results[1]
    assert results[0]["step"] == 3
    single = _fanout(1, variant="histogram")[0]
    np.testing.assert_allclose(results[0]["g"], single["g"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["d"], single["d"], rtol=1e-6)


@pytest.mark.slow
def test_cross_process_checkpoint_roundtrip(tmp_path):
    """Distributed orbax save -> restore across the process boundary:
    a 2-process run trains 3 steps and checkpoints; a FRESH 2-process run
    restores and must see the same step and bit-identical params (the
    checksum is an exact f64 content signature)."""
    ckpt_dir = str(tmp_path / "dist-ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)

    saved = _fanout(2, action="save", ckpt_dir=ckpt_dir)
    assert saved[0]["step"] == 3
    assert saved[0]["checksum"] == saved[1]["checksum"]

    restored = _fanout(2, action="restore", ckpt_dir=ckpt_dir)
    assert restored[0] == restored[1]
    assert restored[0]["step"] == 3
    assert restored[0]["checksum"] == saved[0]["checksum"]
