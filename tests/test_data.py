import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palette_and_histo_gan_tpu.config import Config, TEST_SIZE, config_for_variant
from palette_and_histo_gan_tpu.data import loader
from palette_and_histo_gan_tpu.ops import palette as pal_ops

DATA_ROOT = Config().data_root
HAS_DATA = os.path.isdir(os.path.join(DATA_ROOT, "train", "2-front"))

needs_data = pytest.mark.skipif(not HAS_DATA, reason="rpg-maker-xp dataset not found")


@needs_data
def test_load_split_arrays_shapes():
    arr = loader.load_split_arrays(DATA_ROOT, "test", 2)
    assert arr.shape == (TEST_SIZE, 64, 64, 4)
    assert arr.dtype == np.uint8


@needs_data
def test_prepare_rgba_blackens():
    arr = loader.load_split_arrays(DATA_ROOT, "test", 2)
    prepped = loader.prepare_rgba(arr)
    transparent = prepped[..., 3] == 0
    assert np.all(prepped[transparent] == 0)
    assert prepped.dtype == np.float32
    assert prepped.max() <= 255.0


@needs_data
def test_make_rgba_datasets():
    config = config_for_variant("baseline-no-aug", data_root=DATA_ROOT)
    train, test = loader.make_rgba_datasets(config)
    assert train.n == 250 and test.n == 44
    assert train.sources.shape == (250, 64, 64, 4)
    # sources/targets are paired by index: same sprite, different pose
    assert not np.array_equal(
        np.asarray(train.sources[0]), np.asarray(train.targets[0])
    )


def test_batch_indices_epoch_coverage():
    key = jax.random.PRNGKey(0)
    n, b = 10, 4
    spe = -(-n // b)  # 3 batches of 4 = 12 draws, wrapping by 2
    idx = jnp.concatenate(
        [loader.batch_indices(key, jnp.int32(s), n, b) for s in range(spe)]
    )
    # within one epoch every example appears at least once
    assert set(np.asarray(idx).tolist()) == set(range(n))
    # different epochs give different permutations
    e2 = jnp.concatenate(
        [loader.batch_indices(key, jnp.int32(s + spe), n, b) for s in range(spe)]
    )
    assert not np.array_equal(np.asarray(idx), np.asarray(e2))
    # deterministic per (key, step)
    again = loader.batch_indices(key, jnp.int32(1), n, b)
    np.testing.assert_array_equal(loader.batch_indices(key, jnp.int32(1), n, b), again)


@needs_data
def test_make_indexed_datasets_roundtrip():
    config = config_for_variant("indexed", data_root=DATA_ROOT)
    _, test = loader.make_indexed_datasets(config)
    assert test.sources.shape == (44, 64, 64, 1)
    assert test.palettes.shape == (44, 256, 4)
    # decoding indices through the palette reproduces the original image
    raw_src = loader.prepare_rgba(
        loader.load_split_arrays(DATA_ROOT, "test", config.source_direction)
    ).astype(np.int32)
    back = pal_ops.indexed_to_rgba(test.sources[0], test.palettes[0])
    np.testing.assert_array_equal(np.asarray(back), raw_src[0])


@needs_data
def test_indexed_palettes_joint():
    config = config_for_variant("indexed", data_root=DATA_ROOT)
    _, test = loader.make_indexed_datasets(config)
    raw_tgt = loader.prepare_rgba(
        loader.load_split_arrays(DATA_ROOT, "test", config.target_direction)
    ).astype(np.int32)
    # target decodes through the same joint palette
    back = pal_ops.indexed_to_rgba(test.targets[3], test.palettes[3])
    np.testing.assert_array_equal(np.asarray(back), raw_tgt[3])
