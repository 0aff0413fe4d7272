"""Train-step tests on width-reduced networks (same structure, fast compiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palette_and_histo_gan_tpu.config import config_for_variant
from palette_and_histo_gan_tpu.models.networks import PatchDiscriminator, UnetGenerator
from palette_and_histo_gan_tpu.train.state import (
    Models,
    TrainState,
    make_optimizer,
)
from palette_and_histo_gan_tpu.train import steps as steps_mod

TINY_DOWN = (8, 8, 8, 8, 8, 8)
TINY_UP = (8, 8, 8, 8, 8, 8)


def tiny_models(config):
    gen = UnetGenerator(
        input_channels=config.generator_in_channels,
        output_channels=config.generator_out_channels,
        last_activation=config.generator_last_activation,
        down_filters=TINY_DOWN,
        up_filters=TINY_UP,
    )
    disc = PatchDiscriminator(input_channels=config.discriminator_in_channels)
    return Models(gen, disc, make_optimizer(config), make_optimizer(config))


def tiny_state(config, models, seed=0):
    k = jax.random.PRNGKey(seed)
    k_g, k_d, k_s = jax.random.split(k, 3)
    img = config.img_size
    g_in = jnp.zeros((1, img, img, config.generator_in_channels))
    d_in = jnp.zeros((1, img, img, config.discriminator_in_channels))
    g_params = models.generator.init(k_g, g_in, deterministic=True)["params"]
    d_params = models.discriminator.init(k_d, d_in, d_in)["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt_state=models.g_tx.init(g_params),
        d_opt_state=models.d_tx.init(d_params),
        rng=k_s,
    )


def rgba_batch(seed=1, batch=2):
    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.integers(0, 256, (batch, 64, 64, 4)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 256, (batch, 64, 64, 4)), jnp.float32)
    return src, tgt


def _max_param_delta(a, b):
    return max(
        float(jnp.max(jnp.abs(x - y)))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_baseline_step_updates_and_metrics():
    config = config_for_variant("baseline-no-aug", donate_state=False)
    models = tiny_models(config)
    state = tiny_state(config, models)
    src, tgt = rgba_batch()
    new_state, metrics = steps_mod.rgba_train_step(config, models, state, src, tgt)
    for key in [
        "generator/total_loss",
        "generator/adversarial_loss",
        "generator/l1_loss",
        "discriminator/total_loss",
        "discriminator/real_loss",
        "discriminator/fake_loss",
    ]:
        assert key in metrics
        assert np.isfinite(float(metrics[key])), key
    assert int(new_state.step) == 1
    assert _max_param_delta(state.g_params, new_state.g_params) > 0
    assert _max_param_delta(state.d_params, new_state.d_params) > 0


def test_histogram_step_has_histogram_loss():
    config = config_for_variant("histogram", donate_state=False)
    models = tiny_models(config)
    state = tiny_state(config, models)
    src, tgt = rgba_batch(2)
    _, metrics = steps_mod.rgba_train_step(config, models, state, src, tgt)
    assert "generator/histogram_loss" in metrics
    assert np.isfinite(float(metrics["generator/histogram_loss"]))
    assert float(metrics["generator/histogram_loss"]) >= 0


def test_indexed_step_gradient_topology():
    config = config_for_variant("indexed", donate_state=False)
    models = tiny_models(config)
    state = tiny_state(config, models)
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.integers(0, 16, (2, 64, 64, 1)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 16, (2, 64, 64, 1)), jnp.int32)

    new_state, metrics = steps_mod.indexed_train_step(config, models, state, src, tgt)
    assert "generator/segmentation_loss" in metrics
    assert int(new_state.step) == 1
    # CCE drives G; D trains on index maps
    assert _max_param_delta(state.g_params, new_state.g_params) > 0
    assert _max_param_delta(state.d_params, new_state.d_params) > 0

    # with lambda_seg = 0 the only G-touching term is the adversarial BCE,
    # which flows through argmax -> zero gradient -> G unchanged by Adam?
    # (Adam with exactly-zero grads produces zero updates)
    config0 = config.replace(lambda_segmentation=0.0)
    new_state0, _ = steps_mod.indexed_train_step(config0, models, state, src, tgt)
    assert _max_param_delta(state.g_params, new_state0.g_params) == 0.0
    assert _max_param_delta(state.d_params, new_state0.d_params) > 0


def test_augmented_step_compiles_and_runs():
    config = config_for_variant("baseline", donate_state=False)
    models = tiny_models(config)
    state = tiny_state(config, models)
    src, tgt = rgba_batch(4)
    new_state, metrics = steps_mod.rgba_train_step(config, models, state, src, tgt)
    assert np.isfinite(float(metrics["generator/total_loss"]))
    assert int(new_state.step) == 1


def test_step_determinism():
    config = config_for_variant("baseline-no-aug", donate_state=False)
    models = tiny_models(config)
    src, tgt = rgba_batch(5)
    s1 = tiny_state(config, models, seed=7)
    s2 = tiny_state(config, models, seed=7)
    n1, m1 = steps_mod.rgba_train_step(config, models, s1, src, tgt)
    n2, m2 = steps_mod.rgba_train_step(config, models, s2, src, tgt)
    assert float(m1["generator/total_loss"]) == float(m2["generator/total_loss"])
    np.testing.assert_array_equal(
        jax.tree.leaves(n1.g_params)[0], jax.tree.leaves(n2.g_params)[0]
    )


def test_generate_fn_shapes():
    config = config_for_variant("baseline-no-aug")
    models = tiny_models(config)
    state = tiny_state(config, models)
    gen_fn = steps_mod.make_generate_fn(config, models)
    src = jnp.zeros((2, 64, 64, 4))
    out = gen_fn(state.g_params, src, jax.random.PRNGKey(0))
    assert out.shape == (2, 64, 64, 4)

    config_i = config_for_variant("indexed")
    models_i = tiny_models(config_i)
    state_i = tiny_state(config_i, models_i)
    gen_i = steps_mod.make_generate_fn(config_i, models_i)
    out = gen_i(state_i.g_params, jnp.zeros((2, 64, 64, 1), jnp.int32), jax.random.PRNGKey(0))
    assert out.shape == (2, 64, 64, 1) and out.dtype == jnp.int32


def test_resolve_augment_impl(monkeypatch):
    """"auto" picks Pallas on TPU regardless of host device count (a
    mesh-less jit still runs on ONE device, so the unsharded pallas_call is
    safe) and XLA on CPU; explicit values pass through untouched."""
    config = config_for_variant("baseline")
    assert steps_mod._resolve_augment_impl(config, mesh=None) == "xla"  # CPU

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert steps_mod._resolve_augment_impl(config, mesh=None) == "pallas"
    assert steps_mod._resolve_augment_impl(config, mesh=object()) == "pallas"

    explicit = config.replace(augment_impl="xla")
    assert steps_mod._resolve_augment_impl(explicit, mesh=None) == "xla"


def test_chunk_packed_pallas_matches_per_step():
    """With the Pallas augmentation selected and a uint8 dataset, the chunk
    passes the 4-byte-lane gather's u32 pixels STRAIGHT to the kernel
    (steps.step_wants_packed; the XLA-side unpack never exists) — and the
    result equals running the per-step path on unpacked uint8 batches."""
    from palette_and_histo_gan_tpu.data.loader import batch_indices

    config = config_for_variant(
        "baseline",
        donate_state=False,
        batch_size=4,
        augment_impl="pallas",
        down_filters=TINY_DOWN,
        up_filters=TINY_UP,
    )
    assert steps_mod.step_wants_packed(config)
    models = tiny_models(config)
    state = tiny_state(config, models)

    n_data = 8
    rng = np.random.default_rng(23)
    dataset = (
        jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 4)), jnp.uint8),
        jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 4)), jnp.uint8),
    )
    data_key = jax.random.PRNGKey(6)
    num_steps = 2

    chunk = steps_mod.make_train_chunk(config, models, n_data)
    chunk_state, chunk_metrics = chunk(state, dataset, data_key, num_steps)

    ref_state = state
    for _ in range(num_steps):
        idx = batch_indices(
            data_key, ref_state.step, n_data, config.batch_size
        )
        ref_state, ref_metrics = steps_mod.rgba_train_step(
            config, models, ref_state, dataset[0][idx], dataset[1][idx]
        )

    assert int(chunk_state.step) == num_steps
    np.testing.assert_allclose(
        float(chunk_metrics["generator/total_loss"][-1]),
        float(ref_metrics["generator/total_loss"]),
        rtol=1e-6,
    )
    for a, b in zip(
        jax.tree.leaves(ref_state.g_params),
        jax.tree.leaves(chunk_state.g_params),
    ):
        # scan-compiled vs per-step programs reduce in different orders;
        # Adam's 1/sqrt(v) amplifies the last-bit gradient differences
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_indexed_step_finite_with_out_of_range_labels():
    """A target map containing a scatter-sum-collision label (> 255, from a
    sprite pixel equal to the hotpink filler — see ops/palette.py::
    rgba_to_indexed) must train with finite losses: the reference one-hots
    such labels to an all-zero row (pix2pix_model.py:300) and the log-space
    losses reproduce that (train/losses.py::_valid_label)."""
    config = config_for_variant("indexed", donate_state=False)
    models = tiny_models(config)
    state = tiny_state(config, models)
    rng = np.random.default_rng(13)
    src = jnp.asarray(rng.integers(0, 16, (2, 64, 64, 1)), jnp.int32)
    tgt = np.asarray(rng.integers(0, 16, (2, 64, 64, 1)), np.int32)
    tgt[0, 0, 0, 0] = 301  # e.g. index 46 + filler slot 255 collision
    tgt = jnp.asarray(tgt)

    new_state, metrics = steps_mod.indexed_train_step(config, models, state, src, tgt)
    for name, value in metrics.items():
        assert np.isfinite(float(value)), (name, float(value))
    assert _max_param_delta(state.g_params, new_state.g_params) > 0


def test_dropout_key_selection_rules():
    """steps._dropout_key: 'rbg' rewraps to the hardware RBG only off-mesh
    and only up to RBG_GENERATE_MAX_BATCH; mesh-sharded and large-batch
    callers keep the partitionable threefry key unchanged (the SPMD
    bit-equality contract in parallel/dp.py; the measured large-batch
    serving regression in docs/DESIGN.md)."""
    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.train.steps import (
        RBG_GENERATE_MAX_BATCH,
        _dropout_key,
    )

    cfg_rbg = config_for_variant("baseline-no-aug")
    cfg_tf = config_for_variant("baseline-no-aug", dropout_prng="threefry")
    key = jax.random.PRNGKey(3)

    def impl_name(k):
        return str(k.dtype) if jnp.issubdtype(k.dtype, jax.dtypes.prng_key) else "raw"

    # threefry config: always pass-through
    assert _dropout_key(cfg_tf, key) is key
    # rbg config, single device, no/small batch: rewrapped to the RBG impl
    assert "rbg" in impl_name(_dropout_key(cfg_rbg, key))
    assert "rbg" in impl_name(
        _dropout_key(cfg_rbg, key, batch=RBG_GENERATE_MAX_BATCH)
    )
    # mesh-sharded: unchanged (threefry), whatever the config says
    assert _dropout_key(cfg_rbg, key, mesh=object()) is key
    # above the measured serving crossover: unchanged
    assert _dropout_key(cfg_rbg, key, batch=RBG_GENERATE_MAX_BATCH + 1) is key
