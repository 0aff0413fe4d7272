"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; forcing 8 virtual CPU
devices lets the sharding/collective tests exercise real mesh partitioning
logic on CPU (SURVEY.md §4).

The environment pre-registers an accelerator plugin at interpreter start
(sitecustomize) and forces `jax_platforms` via jax.config — env vars alone
(JAX_PLATFORMS, XLA_FLAGS --xla_force_host_platform_device_count) are
ignored here. The effective mechanism is the two jax.config.update calls
below (`jax_platforms=cpu`, `jax_num_cpu_devices=8`) plus clearing any
already-initialized backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # belt-and-braces; config below decides
# keep TF (used only to generate golden fixtures) off any accelerator
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# build the native PNG decoder if the checkout is fresh (a ~2 s g++ call);
# tests/test_native.py otherwise skips its 5 tests
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_so = os.path.join(_repo, "palette_and_histo_gan_tpu", "native", "libphg_png.so")
if not os.path.exists(_so):
    import subprocess
    import sys as _sys

    try:
        subprocess.run(
            [_sys.executable, os.path.join(_repo, "scripts", "build_native.py")],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        pass  # no toolchain: the native tests skip, everything else runs

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compilation cache: the suite is compile-dominated on this
# 1-core host; caching executables across tests/runs cuts wall time and
# collapses the multi-process compile skew tests/test_distributed.py's
# workers are sensitive to (they set the same cache themselves)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass
