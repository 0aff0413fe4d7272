"""Multi-host (multi-process) data-parallel training.

The reference has no distributed story (SURVEY.md §2.3); the build's
multi-host recipe is `parallel.distributed.initialize` -> global mesh ->
the same `make_dp_train_chunk` program, with the gradient all-reduce
riding DCN across hosts (here: Gloo across two local CPU processes —
JAX's standard fake-multihost trick, 2 processes x 2 CPU devices each).

Asserts the strongest property available without hardware: the 2-process
4-device chunk produces bitwise the same losses as a single-process
4-device run of the identical program, i.e. crossing the process (DCN)
boundary changes nothing about the training computation.
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
# touch (mirrors conftest.py), optionally joins a 2-process distributed
# service, then runs the production DP chunk on a tiny model and prints
# one JSON line of losses.
_WORKER = """
import sys
port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4 // nprocs)
sys.path.insert(0, {repo!r})
from palette_and_histo_gan_tpu.parallel import distributed
if nprocs > 1:
    distributed.initialize(f"127.0.0.1:{{port}}", nprocs, pid)
    info = distributed.global_mesh_info()
    assert info["process_count"] == nprocs, info
    assert info["local_devices"] == 4 // nprocs, info
    assert info["global_devices"] == 4, info

import json
import numpy as np
import jax.numpy as jnp
from palette_and_histo_gan_tpu.config import config_for_variant
from palette_and_histo_gan_tpu.parallel import dp as dp_mod
from palette_and_histo_gan_tpu.parallel import mesh as mesh_mod
from palette_and_histo_gan_tpu.train.state import build_models, create_train_state

config = config_for_variant(
    "baseline",
    donate_state=False,
    batch_size=4,
    down_filters=(8,) * 6,
    up_filters=(8,) * 6,
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
chunk = dp_mod.make_dp_train_chunk(config, models, mesh, n_data)
new_state, metrics = chunk(state, dataset, jax.random.PRNGKey(2), 3)
out = {{
    "g": np.asarray(metrics["generator/total_loss"]).tolist(),
    "d": np.asarray(metrics["discriminator/total_loss"]).tolist(),
    "step": int(new_state.step),
}}
print("RESULT " + json.dumps(out), flush=True)
""".format(repo=REPO)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_worker(port: int, pid: int, nprocs: int) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(port), str(pid), str(nprocs)],
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


@pytest.mark.slow
def test_two_process_dp_chunk_matches_single_process():
    port = _free_port()
    procs = [_run_worker(port, pid, 2) for pid in range(2)]
    results = [_result(p) for p in procs]

    # both processes observe identical replicated metrics
    assert results[0] == results[1]
    assert results[0]["step"] == 3
    assert np.all(np.isfinite(results[0]["g"]))
    assert np.all(np.isfinite(results[0]["d"]))

    # and the cross-process program computes exactly what one process
    # over the same 4-device mesh computes
    single = _result(_run_worker(port, 0, 1))
    np.testing.assert_allclose(results[0]["g"], single["g"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["d"], single["d"], rtol=1e-6)
