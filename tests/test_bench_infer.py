"""The serving benchmark measures the real program: scripts/bench_infer's
scanned chunk equals per-step generate_core calls (same gather pattern,
same normalize, same fold_in dropout keys), so its device-clock numbers
are numbers for the production inference path."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from palette_and_histo_gan_tpu.config import config_for_variant
from palette_and_histo_gan_tpu.train.state import build_models, create_train_state
from palette_and_histo_gan_tpu.train.steps import generate_core


def _chunk_vs_direct(variant: str):
    import bench_infer

    config = config_for_variant(
        variant,
        batch_size=4,
        donate_state=False,
        down_filters=(8,) * 6,
        up_filters=(8,) * 6,
    )
    models = build_models(config)
    state = create_train_state(config, models, jax.random.PRNGKey(0))
    n_data = 16
    rng = np.random.default_rng(0)
    if config.is_indexed:
        pool = jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 1)), jnp.int32)
    else:
        pool = jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 4)), jnp.uint8)

    chunk = bench_infer.make_infer_chunk(config, models, n_data)
    key = jax.random.PRNGKey(1)
    steps = 3
    got = float(chunk(state.g_params, pool, key, num_steps=steps))

    core = generate_core(config, models)
    base = jnp.arange(config.batch_size, dtype=jnp.int32)
    want = 0.0
    for i in range(steps):
        src = pool[(base + i * 8191) % n_data]
        if not config.is_indexed:
            src = src.astype(jnp.float32) / 127.5 - 1.0
        out = core(state.g_params, src, jax.random.fold_in(key, i))
        want += float(jnp.sum(out.astype(jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_infer_chunk_matches_direct_generate_rgba():
    _chunk_vs_direct("baseline-no-aug")


def test_infer_chunk_matches_direct_generate_indexed():
    _chunk_vs_direct("indexed")


def test_infer_chunk_deterministic_matches_export_semantics():
    """--deterministic benchmarks what models/export.py serves: dropout OFF,
    plain generator apply (with the inference head swap)."""
    import bench_infer

    from palette_and_histo_gan_tpu.train.steps import inference_models

    config = config_for_variant(
        "baseline-no-aug",
        batch_size=4,
        donate_state=False,
        down_filters=(8,) * 6,
        up_filters=(8,) * 6,
        infer_head_conv="nchw",
    )
    models = build_models(config)
    state = create_train_state(config, models, jax.random.PRNGKey(0))
    n_data = 16
    pool = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (n_data, 64, 64, 4)), jnp.uint8
    )
    chunk = bench_infer.make_infer_chunk(config, models, n_data, deterministic=True)
    key = jax.random.PRNGKey(1)
    got = float(chunk(state.g_params, pool, key, num_steps=2))

    gen = inference_models(config, models).generator
    base = jnp.arange(config.batch_size, dtype=jnp.int32)
    want = 0.0
    for i in range(2):
        src = pool[(base + i * 8191) % n_data].astype(jnp.float32) / 127.5 - 1.0
        out = gen.apply({"params": state.g_params}, src, deterministic=True)
        want += float(jnp.sum(out.astype(jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4)
