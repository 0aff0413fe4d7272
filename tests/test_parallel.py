"""Data-parallel sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palette_and_histo_gan_tpu.config import config_for_variant
from palette_and_histo_gan_tpu.parallel import dp as dp_mod
from palette_and_histo_gan_tpu.parallel import mesh as mesh_mod
from tests.test_train_steps import rgba_batch, tiny_models, tiny_state


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices (XLA_FLAGS host device count)")
    return mesh_mod.make_mesh(devices[:8])


def test_mesh_axes(mesh8):
    assert mesh8.axis_names == ("data", "model")
    assert mesh8.devices.shape == (8, 1)


def test_shard_batch_placement(mesh8):
    src, _ = rgba_batch(batch=16)
    sharded = mesh_mod.shard_batch(mesh8, src)
    assert sharded.sharding.is_equivalent_to(
        mesh_mod.batch_sharding(mesh8), sharded.ndim
    )
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(src))


def test_dp_step_matches_single_device(mesh8):
    """Sharded-vs-single-device numerical equality (SURVEY.md §4)."""
    config = config_for_variant("baseline-no-aug", donate_state=False)
    models = tiny_models(config)
    state = tiny_state(config, models)
    src, tgt = rgba_batch(seed=11, batch=8)

    from palette_and_histo_gan_tpu.train.steps import rgba_train_step

    ref_state, ref_metrics = rgba_train_step(config, models, state, src, tgt)

    dp_step = dp_mod.make_dp_train_step(config, models, mesh8)
    state_r = mesh_mod.replicate_state(mesh8, state)
    src_s = mesh_mod.shard_batch(mesh8, src)
    tgt_s = mesh_mod.shard_batch(mesh8, tgt)
    dp_state, dp_metrics = dp_step(state_r, src_s, tgt_s)

    np.testing.assert_allclose(
        float(dp_metrics["generator/total_loss"]),
        float(ref_metrics["generator/total_loss"]),
        rtol=1e-5,
    )
    for a, b in zip(jax.tree.leaves(ref_state.g_params), jax.tree.leaves(dp_state.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_step_runs_augmented(mesh8):
    config = config_for_variant("baseline", donate_state=False)
    models = tiny_models(config)
    state = mesh_mod.replicate_state(mesh8, tiny_state(config, models))
    src, tgt = rgba_batch(seed=12, batch=16)
    dp_step = dp_mod.make_dp_train_step(config, models, mesh8)
    new_state, metrics = dp_step(
        state, mesh_mod.shard_batch(mesh8, src), mesh_mod.shard_batch(mesh8, tgt)
    )
    assert np.isfinite(float(metrics["generator/total_loss"]))
    assert int(new_state.step) == 1


def test_dp_generate(mesh8):
    config = config_for_variant("baseline-no-aug")
    models = tiny_models(config)
    state = mesh_mod.replicate_state(mesh8, tiny_state(config, models))
    gen = dp_mod.make_dp_generate_fn(config, models, mesh8)
    src = mesh_mod.shard_batch(mesh8, jnp.zeros((8, 64, 64, 4)))
    out = gen(state.g_params, src, jax.random.PRNGKey(0))
    assert out.shape == (8, 64, 64, 4)
