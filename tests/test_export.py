"""Serving-export round trip: serialize, deserialize, run, compare."""

import jax
import jax.numpy as jnp
import numpy as np

from palette_and_histo_gan_tpu.config import config_for_variant
from palette_and_histo_gan_tpu.models import export as export_mod
from tests.test_train_steps import tiny_models, tiny_state


def test_generator_export_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = config_for_variant("baseline-no-aug")
    models = tiny_models(config)
    state = tiny_state(config, models)

    blob = export_mod.export_generator_serialized(config, models, state.g_params, 2)
    path = export_mod.save_exported(config, "generator", blob)
    infer = export_mod.load_exported(path)

    src = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 4)), jnp.float32
    )
    served = infer(src)
    direct = models.generator.apply(
        {"params": state.g_params}, src, deterministic=True
    )
    np.testing.assert_allclose(np.asarray(served), np.asarray(direct), rtol=1e-5, atol=1e-6)


def test_generator_export_with_infer_head_nchw(tmp_path, monkeypatch):
    """Export under config.infer_head_conv="nchw" serves the same images."""
    import dataclasses

    monkeypatch.chdir(tmp_path)
    config = config_for_variant("baseline-no-aug")
    models = tiny_models(config)
    state = tiny_state(config, models)

    nchw_cfg = dataclasses.replace(config, infer_head_conv="nchw")
    blob = export_mod.export_generator_serialized(nchw_cfg, models, state.g_params, 2)
    path = export_mod.save_exported(nchw_cfg, "generator", blob)
    infer = export_mod.load_exported(path)

    src = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 4)), jnp.float32
    )
    served = infer(src)
    direct = models.generator.apply(
        {"params": state.g_params}, src, deterministic=True
    )
    np.testing.assert_allclose(
        np.asarray(served), np.asarray(direct), rtol=1e-5, atol=1e-6
    )


def test_discriminator_export_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = config_for_variant("baseline-no-aug")
    models = tiny_models(config)
    state = tiny_state(config, models)

    blob = export_mod.export_discriminator_serialized(config, models, state.d_params, 1)
    path = export_mod.save_exported(config, "discriminator", blob)
    infer = export_mod.load_exported(path)

    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 4)), jnp.float32)
    s = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 4)), jnp.float32)
    served = infer(t, s)
    direct = models.discriminator.apply({"params": state.d_params}, t, s)
    assert served.shape == (1, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(served), np.asarray(direct), rtol=1e-5, atol=1e-6)


def test_discriminate_fn_infer_head_nchw_matches_train_head():
    """The discriminator's 64->1 patch head gets the same inference-only
    lowering as the generator's; patch maps are unchanged."""
    import dataclasses

    from palette_and_histo_gan_tpu.train.steps import make_discriminate_fn

    config = config_for_variant("baseline-no-aug")
    models = tiny_models(config)
    state = tiny_state(config, models)

    rng = np.random.default_rng(2)
    t = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 4)), jnp.float32)
    s = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 4)), jnp.float32)
    ref = make_discriminate_fn(config, models)(state.d_params, t, s)
    nchw_cfg = dataclasses.replace(config, infer_head_conv="nchw")
    out = make_discriminate_fn(nchw_cfg, models)(state.d_params, t, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
