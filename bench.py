"""Benchmark: train-step throughput of the flagship (histogram) model.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Measures the full histogram-variant train step (G fwd + both D passes +
histogram loss + both backward passes + two Adam updates) at large batch on
one chip, compile time excluded, steps blocked on completion.
`vs_baseline` is the ratio against the north-star target of 20,000
images/sec/chip (BASELINE.json; the reference publishes no numbers of its
own — BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# persistent compile cache: TPU compiles via the remote service take minutes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 20000.0
# TPU v5e (v5 lite) public peak: 197 TFLOP/s bf16 per chip
V5E_PEAK_FLOPS = 197e12


from palette_and_histo_gan_tpu.utils.profiling import (
    device_step_seconds,
    marginal_step_seconds,
)


def step_flops(config, batch) -> float:
    """Analytic MXU FLOPs per step (utils/flops.py).

    XLA's `cost_analysis()` is NOT used: on this backend TPU convolutions
    lower to custom calls with no attributed FLOPs, undercounting ~15x."""
    from palette_and_histo_gan_tpu.utils.flops import train_step_flops_per_image

    return train_step_flops_per_image(config) * batch


def main():
    batch = int(os.environ.get("PHG_BENCH_BATCH", "1024"))
    # 60-step chunks: short-chunk marginals on the tunneled backend have
    # produced up-to-4x-optimistic artifacts at 20 steps (ab8 vs ab9 A/B);
    # longer chunks amortize whatever the relay hides
    steps = int(os.environ.get("PHG_BENCH_STEPS", "60"))
    dtype = os.environ.get("PHG_BENCH_DTYPE", "bfloat16")

    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.train.state import build_models, create_train_state
    from palette_and_histo_gan_tpu.train.steps import make_train_chunk

    config = config_for_variant(
        "histogram", compute_dtype=dtype, batch_size=batch, donate_state=True
    )
    models = build_models(config)
    state = create_train_state(config, models, jax.random.PRNGKey(0))

    # synthetic HBM-resident dataset with the real pipeline shape; the chunk
    # samples/augments/normalizes on device exactly as training does
    # pool >= batch so batch_indices never wraps duplicate rows into one
    # batch (matches sweep.py/trace_ops.py methodology)
    n_data = max(1024, batch)
    rng = np.random.default_rng(0)
    dataset = (
        jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 4)), jnp.uint8),
        jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 4)), jnp.uint8),
    )
    chunk = make_train_chunk(config, models, n_data)
    data_key = jax.random.PRNGKey(1)

    def timed(n):
        nonlocal state
        t0 = time.perf_counter()
        state, mm = chunk(state, dataset, data_key, n)
        # a host fetch of the final metrics forces the whole dependency chain;
        # block_until_ready alone is unreliable on tunneled backends
        float(mm["generator/total_loss"][-1])
        return time.perf_counter() - t0

    # compile + warmup with the SAME num_steps program that gets measured:
    # num_steps is a static argument of the chunk jit, so timed(2) would
    # compile a throwaway program and leave the real one to compile cold
    # inside the profiler trace
    timed(steps)

    # PRIMARY clock: device-side XLA-op time from a profiler trace. Host-side
    # wall timing through the tunneled backend has shown +-25% episodes (two
    # back-to-back 60-step runs of one binary measured 23.4k and 18.4k
    # img/s); summing the trace's leaf "XLA Ops" durations counts actual
    # device occupancy and is immune to relay jitter.
    device_step = device_step_seconds(timed, steps)

    best = device_step
    if best is None:
        # fallback: best-of-3 marginal rate (shared methodology —
        # utils/profiling.py::marginal_step_seconds)
        best = marginal_step_seconds(timed, steps)
    if best is None:
        raise RuntimeError(
            "no device trace and all host-marginal samples were "
            "non-positive (tunnel latency noise); re-run"
        )
    images_per_sec = batch / best

    # MFU from analytic MXU FLOPs of the step (VERDICT r1 #9)
    flops = step_flops(config, batch)
    record = {
        "metric": f"images/sec/chip (64x64 histogram-pix2pix train step, batch {batch}, {dtype})",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / NORTH_STAR, 4),
        "flops_per_image": round(flops / batch),
        "mfu": round(flops / best / V5E_PEAK_FLOPS, 4),
        "clock": "device-trace" if device_step is not None else "host-marginal",
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
