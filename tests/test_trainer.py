"""Trainer loop, checkpoint/restore, and export tests (tiny nets, real data)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palette_and_histo_gan_tpu.config import Config, config_for_variant
from palette_and_histo_gan_tpu.train import checkpoint as ckpt_mod
from palette_and_histo_gan_tpu.train import trainer as trainer_mod
from palette_and_histo_gan_tpu.train.steps import make_train_chunk
from tests.test_train_steps import rgba_batch, tiny_models, tiny_state

DATA_ROOT = Config().data_root
HAS_DATA = os.path.isdir(os.path.join(DATA_ROOT, "train", "2-front"))
needs_data = pytest.mark.skipif(not HAS_DATA, reason="dataset not found")


def test_train_chunk_scan_runs():
    config = config_for_variant("baseline-no-aug", donate_state=False)
    models = tiny_models(config)
    state = tiny_state(config, models)
    rng = np.random.default_rng(0)
    n = 12
    srcs = jnp.asarray(rng.integers(0, 256, (n, 64, 64, 4)), jnp.float32)
    tgts = jnp.asarray(rng.integers(0, 256, (n, 64, 64, 4)), jnp.float32)
    chunk = make_train_chunk(config, models, n)
    new_state, metrics = chunk(state, (srcs, tgts), jax.random.PRNGKey(1), 5)
    assert int(new_state.step) == 5
    assert metrics["generator/total_loss"].shape == (5,)
    assert np.all(np.isfinite(np.asarray(metrics["generator/total_loss"])))


def test_checkpoint_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = config_for_variant(
        "baseline-no-aug", donate_state=False, temp_folder=str(tmp_path / "tmp")
    )
    models = tiny_models(config)
    state = tiny_state(config, models)
    src, tgt = rgba_batch()
    from palette_and_histo_gan_tpu.train.steps import rgba_train_step

    state, _ = rgba_train_step(config, models, state, src, tgt)

    manager = ckpt_mod.make_manager(config)
    ckpt_mod.save(manager, state)
    manager.wait_until_finished()

    fresh = tiny_state(config, models, seed=99)
    assert not ckpt_mod.params_equal(fresh.g_params, state.g_params)
    restored = ckpt_mod.restore(manager, fresh)
    assert int(restored.step) == 1
    assert ckpt_mod.params_equal(restored.g_params, state.g_params)
    assert ckpt_mod.params_equal(restored.d_params, state.d_params)
    # optimizer moments restored too (full resume capability)
    assert ckpt_mod.params_equal(restored.g_opt_state, state.g_opt_state)


def test_async_saver_lagged_writes(tmp_path, monkeypatch):
    """AsyncSaver semantics: the write for snapshot k lands at save k+1 /
    flush, the snapshot is donation-immune, and restore round-trips."""
    monkeypatch.chdir(tmp_path)
    config = config_for_variant(
        "baseline-no-aug", donate_state=False, temp_folder=str(tmp_path / "tmp")
    )
    models = tiny_models(config)
    state1 = tiny_state(config, models)
    src, tgt = rgba_batch()
    from palette_and_histo_gan_tpu.train.steps import rgba_train_step

    state2, _ = rgba_train_step(config, models, state1, src, tgt)

    manager = ckpt_mod.make_manager(config)
    saver = ckpt_mod.AsyncSaver(manager)
    saver.save(state1)  # snapshot pending, nothing written yet
    saver.save(state2)  # flushes snapshot 1, snapshot 2 pending
    manager.wait_until_finished()
    assert manager.latest_step() == int(state1.step)
    # mutating/deleting the live state must not corrupt pending snapshot 2
    jax.tree.map(lambda x: x.delete() if hasattr(x, "delete") else None, state2)
    saver.flush()
    assert manager.latest_step() == 1

    fresh = tiny_state(config, models, seed=99)
    restored = ckpt_mod.restore(manager, fresh)
    assert int(restored.step) == 1


def test_params_export_import(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = config_for_variant("baseline-no-aug")
    models = tiny_models(config)
    state = tiny_state(config, models)
    out = ckpt_mod.save_params(config, "generator", state.g_params)
    assert os.path.exists(out)
    other = tiny_state(config, models, seed=5)
    loaded = ckpt_mod.load_params(config, "generator", other.g_params)
    assert ckpt_mod.params_equal(loaded, state.g_params)


@needs_data
@pytest.mark.slow
def test_loss_trajectory_decreases_on_real_data():
    """End-to-end mini-train on the real sprites: the L1 component of the
    generator loss must fall substantially over a few hundred steps
    (SURVEY.md §4: loss-trajectory check)."""
    config = config_for_variant("baseline-no-aug", donate_state=False, data_root=DATA_ROOT)
    from palette_and_histo_gan_tpu.data import make_rgba_datasets

    train_ds, _ = make_rgba_datasets(config)
    models = tiny_models(config)
    state = tiny_state(config, models)
    chunk = make_train_chunk(config, models, train_ds.n)
    dataset = (train_ds.sources, train_ds.targets)
    state, m_first = chunk(state, dataset, jax.random.PRNGKey(1), 20)
    state, m_later = chunk(state, dataset, jax.random.PRNGKey(1), 280)
    first = float(np.mean(np.asarray(m_first["generator/l1_loss"])[:20]))
    last = float(np.mean(np.asarray(m_later["generator/l1_loss"])[-20:]))
    assert np.isfinite(first) and np.isfinite(last)
    assert last < 0.8 * first, (first, last)


@needs_data
@pytest.mark.parametrize("variant", ["baseline-no-aug", "indexed"])
def test_trainer_mini_fit(tmp_path, monkeypatch, variant):
    """A short end-to-end fit through the REAL Trainer constructor
    (config width overrides keep the nets tiny): loop, preview images, L1
    callback, checkpoint. The indexed variant additionally exercises the
    palette-decode preview/eval paths (pix2pix_model.py:332-370)."""
    monkeypatch.chdir(tmp_path)
    config = config_for_variant(
        variant,
        donate_state=False,
        data_root=DATA_ROOT,
        temp_folder=str(tmp_path / "temp"),
        down_filters=(8,) * 6,
        up_filters=(8,) * 6,
        data_parallel="off",
    )
    trainer = trainer_mod.Trainer(config)

    # capture TB image writes at the class level (fit() constructs its own
    # MetricsWriter; the tensorboardX backend may be absent in the test env —
    # the Trainer contract is that it CALLS writer.image)
    from palette_and_histo_gan_tpu.utils import logging as log_utils_mod

    image_tags = []
    real_image = log_utils_mod.MetricsWriter.image
    monkeypatch.setattr(
        log_utils_mod.MetricsWriter,
        "image",
        lambda self, name, img, step: (
            image_tags.append((name, img.shape)),
            real_image(self, name, img, step),
        )[-1],
    )

    trainer.fit(
        steps=4,
        update_steps=2,
        callbacks=["evaluate_l1", "show_discriminator_output"],
    )
    assert int(trainer.state.step) == 4
    # checkpoint written at end
    assert trainer.manager.latest_step() == 4
    # phase breakdown accumulated every phase the run exercised
    for phase in ("train_chunk", "preview", "evaluate_l1", "checkpoint",
                  "scalar_logging", "discriminator_debug"):
        assert trainer.phase_seconds.get(phase, 0.0) > 0.0, phase
    # logs directory with preview images exists
    log_root = os.path.join(config.temp_folder, "logs", config.architecture_name, config.model)
    assert os.path.isdir(log_root)
    # discriminator patch-map figures landed on disk AND went to the writer
    # (the reference displays them inline, pix2pix_model.py:161-229; the CLI
    # context persists them next to the preview grids)
    import glob

    debug_pngs = glob.glob(
        os.path.join(log_root, "**", "discriminated_*_step_*_*.png"),
        recursive=True,
    )
    assert len(debug_pngs) >= 4 * 2, debug_pngs  # 2 test + 2 train, 2 updates
    debug_tags = [t for t, _ in image_tags if "discriminated_" in t]
    assert len(debug_tags) >= 4 * 2, image_tags


@needs_data
@pytest.mark.parametrize("data_parallel,batch", [("off", 4), ("auto", 8)])
def test_resume_trajectory_matches_uninterrupted(
    tmp_path, monkeypatch, data_parallel, batch
):
    """Crash/resume determinism: fit(4 steps) in one go is bit-identical to
    fit(2) -> fresh Trainer -> restore_latest_checkpoint -> fit(2 more).

    This holds by construction — per-step batch sampling derives from
    (data_key, state.step) (data/loader.py::batch_indices), the augment/
    dropout stream rides state.rng which the checkpoint round-trips, and the
    optimizer moments restore exactly — and this test pins it end to end
    through the real Trainer + orbax path, on both the single-device and the
    auto-mesh DP trainer (the latter exercises replicate_state after
    restore). The reference never wired checkpoint restore at all
    (side2side_model.py:121-131 saves only), so this is a capability the
    rebuild adds; exactness is the bar because nothing in the resumed
    program should depend on wall time or host state.
    """
    if data_parallel == "auto" and len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.chdir(tmp_path)
    kw = dict(
        donate_state=False,
        data_root=DATA_ROOT,
        down_filters=(8,) * 6,
        up_filters=(8,) * 6,
        data_parallel=data_parallel,
        batch_size=batch,
    )
    # uninterrupted 4-step run ("baseline": augmentation ON, so the
    # state.rng stream is load-bearing, not just batch sampling)
    config_a = config_for_variant(
        "baseline", temp_folder=str(tmp_path / "a"), **kw
    )
    trainer_a = trainer_mod.Trainer(config_a)
    trainer_a.fit(steps=4, update_steps=2)

    # interrupted run: 2 steps, checkpoint lands at step 2, then a fresh
    # Trainer (new params, new moments — everything must come from disk)
    config_b = config_for_variant(
        "baseline", temp_folder=str(tmp_path / "b"), **kw
    )
    trainer_b = trainer_mod.Trainer(config_b)
    trainer_b.fit(steps=2, update_steps=2)

    resumed = trainer_mod.Trainer(config_b)
    assert not ckpt_mod.params_equal(
        resumed.state.g_params, trainer_b.state.g_params
    )
    start = resumed.restore_latest_checkpoint()
    assert start == 2
    resumed.fit(steps=2, update_steps=2, starting_step=start)

    assert int(resumed.state.step) == 4
    assert ckpt_mod.params_equal(resumed.state.g_params, trainer_a.state.g_params)
    assert ckpt_mod.params_equal(resumed.state.d_params, trainer_a.state.d_params)
    assert ckpt_mod.params_equal(
        resumed.state.g_opt_state, trainer_a.state.g_opt_state
    )
    assert ckpt_mod.params_equal(
        resumed.state.d_opt_state, trainer_a.state.d_opt_state
    )


def test_eval_generate_fn_is_cached():
    """One jitted generate callable per (config, models) per process
    (VERDICT.md round-1 weak #4: per-eval retracing)."""
    from palette_and_histo_gan_tpu.eval import metrics as eval_metrics
    from palette_and_histo_gan_tpu.train.state import build_models

    config = config_for_variant(
        "baseline-no-aug", down_filters=(8,) * 6, up_filters=(8,) * 6
    )
    models = build_models(config)
    fn1 = eval_metrics.cached_generate_fn(config, models)
    fn2 = eval_metrics.cached_generate_fn(config, models)
    assert fn1 is fn2
    # a distinct config gets its own entry
    other = config.replace(seed=config.seed + 1)
    assert eval_metrics.cached_generate_fn(other, models) is not fn1


@needs_data
def test_cli_smoke(tmp_path, monkeypatch, capsys):
    """The CLI end-to-end (zero coverage in round 1): tiny widths, 2 steps."""
    monkeypatch.chdir(tmp_path)
    from palette_and_histo_gan_tpu import cli

    rc = cli.main(
        [
            "--model", "baseline-no-aug",
            "--steps", "2",
            "--update-steps", "2",
            "--batch-size", "2",
            "--down-filters", "8", "8", "8", "8", "8", "8",
            "--up-filters", "8", "8", "8", "8", "8", "8",
            "--data-parallel", "off",
            "--data-root", DATA_ROOT,
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Starting training" in out
    assert os.path.isdir(os.path.join("temp-side2side", "logs"))


def test_cli_rejects_misaligned_data_roots():
    """Multiple --data-roots without (or with misaligned) --dataset-sizes
    must fail at argument parsing, not as a later loader ValueError."""
    import pytest

    from palette_and_histo_gan_tpu import cli

    parser = cli.build_parser()
    with pytest.raises(SystemExit):
        cli.config_from_args(
            parser.parse_args(["--data-roots", "/a", "/b"])
        )
    with pytest.raises(SystemExit):
        cli.config_from_args(
            parser.parse_args(
                ["--data-roots", "/a", "/b", "--dataset-sizes", "294"]
            )
        )
    cfg = cli.config_from_args(
        parser.parse_args(
            ["--data-roots", "/a", "/b", "--dataset-sizes", "100", "200"]
        )
    )
    assert cfg.effective_data_roots == ("/a", "/b")
    assert cfg.dataset_sizes == (100, 200)


@needs_data
def test_import_network_params(tmp_path, monkeypatch):
    """Converted-weights import (MIGRATION.md flow tail): a convert.py-format
    npz loads into the live state, optimizer moments reset, and structure or
    shape mismatches fail loudly."""
    monkeypatch.chdir(tmp_path)
    from palette_and_histo_gan_tpu.models import convert

    config = config_for_variant(
        "baseline-no-aug",
        donate_state=False,
        data_root=DATA_ROOT,
        temp_folder=str(tmp_path / "temp"),
        down_filters=(8,) * 6,
        up_filters=(8,) * 6,
        data_parallel="off",
    )
    trainer = trainer_mod.Trainer(config)

    # a distinct weight set in the converter's npz format
    donor = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + 1.0, trainer.state.g_params
    )
    gen_npz = str(tmp_path / "gen_flax.npz")
    convert.save_params_npz(gen_npz, donor)

    # a non-zero step counter must reset: import is not a resume
    trainer.state = trainer.state.replace(
        step=jnp.asarray(7, trainer.state.step.dtype)
    )
    trainer.import_network_params(generator_npz=gen_npz)
    assert ckpt_mod.params_equal(trainer.state.g_params, donor)
    assert int(trainer.state.step) == 0
    # fresh Adam moments: all zeros
    flat = jax.tree_util.tree_leaves(trainer.state.g_opt_state)
    assert all(np.all(np.asarray(leaf) == 0) for leaf in flat if hasattr(leaf, "shape"))

    # shape mismatch names the offending param
    bad = jax.tree_util.tree_map(lambda a: a, donor)
    bad["DownBlock_0"]["Conv_0"]["kernel"] = np.zeros((4, 4, 4, 16), np.float32)
    bad_npz = str(tmp_path / "bad.npz")
    convert.save_params_npz(bad_npz, bad)
    with pytest.raises(ValueError, match="DownBlock_0"):
        trainer.import_network_params(generator_npz=bad_npz)


def test_cli_resume_and_init_are_exclusive(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from palette_and_histo_gan_tpu import cli

    with pytest.raises(SystemExit, match="mutually"):
        cli.main(["--resume", "--init-generator", "gen.npz"])
