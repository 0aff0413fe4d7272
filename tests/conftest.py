"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; the standard JAX trick of
forcing N host-platform devices lets the sharding/collective tests exercise
real mesh partitioning logic on CPU (SURVEY.md §4).

The environment may pre-register an accelerator plugin at interpreter start
(sitecustomize) and force `jax_platforms` via jax.config — env vars alone are
not enough, so this conftest re-updates the config and clears any
already-initialized backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep TF (used only to generate golden fixtures) off any accelerator
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass
