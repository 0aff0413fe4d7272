"""Serving-throughput benchmark: generator inference on the device clock.

The reference's only inference path generates one image at a time through
matplotlib previews (side2side_model.py:202-222 →
generate_images_from_dataset). This framework serves batched: a jitted
lax.scan of `generate_core` over a pool of resident uint8 batches —
per-iteration batch gather + [0,255]→[-1,1] normalize + U-Net forward
(dropout ON at inference, the reference quirk) — measured with the same
profiler-trace XLA-op-sum clock as bench.py/trace_ops.py (host wall timing
through this host's TPU tunnel has ±25% episodes, docs/DESIGN.md).

Usage:
    python scripts/bench_infer.py [--variant baseline-no-aug]
                                  [--batches 64,256,1024] [--steps 16]

Prints one JSON line per batch size:
    {"variant": ..., "batch": N, "ms_per_batch": ..., "images_per_sec": ...,
     "mfu": ..., "clock": "device-trace"}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16 = 197e12


def make_infer_chunk(config, models, n_data: int, deterministic: bool = False):
    """(g_params, pool_u8/int32, key, num_steps) -> scalar checksum.

    Each scan iteration gathers a fresh batch from the resident pool (a
    rotating index pattern — serving never re-reads the same batch, so the
    normalize/forward must not be hoisted loop-invariant) and runs the
    production generate path. The checksum forces materialization.

    deterministic=True benchmarks the exported-program serving semantics
    instead (models/export.py: dropout OFF, keras SavedModel inference);
    default False matches the reference's in-training generate quirk
    (dropout always on, pix2pix_model.py:60).
    """
    from functools import partial

    from palette_and_histo_gan_tpu.train.steps import generate_core, inference_models

    if deterministic:
        gen = inference_models(config, models).generator
        if config.is_indexed:
            # argmax over logits == argmax over softmax(logits); the linear
            # clone skips the (B, H, W, 256) probability tensor exactly as
            # generate_core does
            gen = gen.clone(last_activation="linear")

        def core(g_params, src, rng):
            del rng
            out = gen.apply({"params": g_params}, src, deterministic=True)
            if config.is_indexed:
                out = jnp.argmax(out, axis=-1)[..., None].astype(jnp.int32)
            return out

    else:
        core = generate_core(config, models)
    batch = config.batch_size

    @partial(jax.jit, static_argnames=("num_steps",))
    def infer_chunk(g_params, pool, key, num_steps: int):
        base = jnp.arange(batch, dtype=jnp.int32)

        def body(acc, i):
            idx = (base + i * 8191) % n_data
            src = pool[idx]
            if not config.is_indexed:
                from palette_and_histo_gan_tpu.ops.image import normalize

                src = normalize(src.astype(jnp.float32))
            out = core(g_params, src, jax.random.fold_in(key, i))
            # full-tensor checksum: a sliced checksum would let XLA narrow
            # the head conv to the consumed window and benchmark a smaller
            # program (it does not today, but nothing guarantees that)
            return acc + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(num_steps)
        )
        return acc

    return infer_chunk


def run(
    variant: str,
    batch: int,
    steps: int,
    dtype: str = "bfloat16",
    infer_head: str | None = None,
    deterministic: bool = False,
    overrides: dict | None = None,
) -> dict:
    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.train.state import build_models, create_train_state
    from palette_and_histo_gan_tpu.utils.flops import _generator_fwd_flops

    overrides = dict(overrides or {})
    if infer_head is not None:
        overrides["infer_head_conv"] = infer_head
    config = config_for_variant(
        variant, batch_size=batch, donate_state=False, compute_dtype=dtype,
        **overrides,
    )
    models = build_models(config)
    state = create_train_state(config, models, jax.random.PRNGKey(0))
    n_data = max(2048, batch)
    rng = np.random.default_rng(0)
    if config.is_indexed:
        pool = jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 1)), jnp.int32)
    else:
        pool = jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 4)), jnp.uint8)

    chunk = make_infer_chunk(config, models, n_data, deterministic=deterministic)
    key = jax.random.PRNGKey(1)

    def timed(n):
        t0 = time.perf_counter()
        float(chunk(state.g_params, pool, key, num_steps=n))
        return time.perf_counter() - t0

    timed(steps)  # compile+warm

    # PRIMARY clock: device-trace XLA-op sum, one shared parser with
    # bench.py/sweep.py/trace_ops.py (utils/profiling.py)
    from palette_and_histo_gan_tpu.utils.profiling import (
        device_step_seconds,
        marginal_step_seconds,
    )

    sec_per_batch = device_step_seconds(timed, steps)

    result = {
        "variant": variant,
        "batch": batch,
        "steps": steps,
        "infer_head_conv": config.infer_head_conv,
        "dropout": "off (exported-program semantics)" if deterministic
        else "on (reference generate quirk)",
        "clock": "device-trace",
    }
    if sec_per_batch is None:
        # fallback: shared best-of-3 host marginal methodology
        # (utils/profiling.py::marginal_step_seconds)
        sec_per_batch = marginal_step_seconds(timed, steps)
        if sec_per_batch is None:
            raise RuntimeError(
                "no device trace and all host-marginal samples were "
                "non-positive (tunnel latency noise); re-run"
            )
        result["clock"] = "host-marginal"
    result["ms_per_batch"] = round(sec_per_batch * 1e3, 3)
    result["images_per_sec"] = round(batch / sec_per_batch, 1)
    result["mfu"] = round(
        _generator_fwd_flops(config) * batch / sec_per_batch / V5E_PEAK_BF16, 4
    )
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="baseline-no-aug")
    p.add_argument("--batches", default="64,256,1024")
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument(
        "--infer-head",
        default=None,
        help="override config.infer_head_conv ('train' | 'nchw')",
    )
    p.add_argument(
        "--deterministic",
        action="store_true",
        help="dropout OFF (exported-program serving semantics) instead of "
        "the reference's dropout-on generate quirk",
    )
    p.add_argument(
        "--override", action="append", default=[], metavar="KEY=VALUE",
        help="config override for device-clock A/Bs (literal-eval'd, "
        "string fallback), e.g. --override dropout_prng=threefry",
    )
    args = p.parse_args()
    import ast

    cli_overrides = {}
    for item in args.override:
        key, _, value = item.partition("=")
        try:
            cli_overrides[key] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            cli_overrides[key] = value
    for batch in (int(b) for b in args.batches.split(",")):
        print(
            json.dumps(
                run(
                    args.variant,
                    batch,
                    args.steps,
                    args.dtype,
                    args.infer_head,
                    args.deterministic,
                    cli_overrides,
                )
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
