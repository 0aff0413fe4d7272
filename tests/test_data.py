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
    # stays uint8 on host/device (4x less HBM than f32); the train step
    # upcasts after the batch gather (data/loader.py::prepare_rgba)
    assert prepped.dtype == np.uint8
    assert prepped.max() <= 255


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


def _write_synthetic_root(root, n, directions=(2, 3), seed=0):
    """A miniature dataset root in the reference's on-disk scheme
    (datasets/<ds>/<train|test>/<i-dir>/<n>.png, dataset_utils.py:197-202)."""
    from PIL import Image

    from palette_and_histo_gan_tpu.config import DIRECTION_FOLDERS, TRAIN_PERCENTAGE
    import math

    n_train = math.ceil(n * TRAIN_PERCENTAGE)
    rng = np.random.default_rng(seed)
    for split, count, offset in (("train", n_train, 0), ("test", n - n_train, 0)):
        for d in directions:
            folder = os.path.join(root, split, DIRECTION_FOLDERS[d])
            os.makedirs(folder, exist_ok=True)
            for i in range(count):
                img = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
                img[..., 3] = np.where(img[..., 3] > 64, 255, 0)  # some alpha
                Image.fromarray(img, "RGBA").save(os.path.join(folder, f"{i}.png"))


def test_multi_dataset_concat(tmp_path):
    """load_concat_split resolves a global index across several dataset
    roots exactly like the reference's while_loop over DATASET_SIZES
    (dataset_utils.py:186-190): root A's images come first, then root B's."""
    root_a, root_b = str(tmp_path / "ds_a"), str(tmp_path / "ds_b")
    _write_synthetic_root(root_a, 10, seed=1)
    _write_synthetic_root(root_b, 12, seed=2)

    config = config_for_variant(
        "baseline-no-aug",
        data_roots=(root_a, root_b),
        dataset_sizes=(10, 12),
    )
    assert config.train_sizes == (9, 11) and config.test_sizes == (1, 1)
    assert config.train_size == 20

    arr = loader.load_concat_split(config, "train", 2)
    assert arr.shape == (20, 64, 64, 4)
    # global-index order: entry 0 is root A's 0.png, entry 9+0 is root B's
    only_a = loader.load_split_arrays(root_a, "train", 2, sizes=(9,))
    only_b = loader.load_split_arrays(root_b, "train", 2, sizes=(11,))
    np.testing.assert_array_equal(arr[:9], only_a)
    np.testing.assert_array_equal(arr[9:], only_b)

    train, test = loader.make_rgba_datasets(config)
    assert train.n == 20 and test.n == 2
    # schedule follows the combined train size (experiments.ipynb cell 10)
    import math

    assert config.steps == math.ceil(20 / config.batch_size) * config.epochs


def test_dataset_sizes_mismatch_raises(tmp_path):
    # misaligned roots/sizes now fail at Config construction (config.py::
    # __post_init__), before any loader code runs
    with pytest.raises(ValueError, match="align 1:1"):
        config_for_variant(
            "baseline-no-aug",
            data_roots=(str(tmp_path),),
            dataset_sizes=(10, 12),
        )
