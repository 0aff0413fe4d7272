"""Parity: Pallas palette-quantization kernel vs the XLA implementation."""

import jax
import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from palette_and_histo_gan_tpu.ops import palette as pal_ops
from palette_and_histo_gan_tpu.ops import palette_pallas as pal_pl


@pytest.fixture(autouse=True)
def _interpret_mode():
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def test_indexed_parity_random():
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 256, (9, 4)).astype(np.int32)
    img = jnp.asarray(pool[rng.integers(0, 9, (64, 64))], jnp.int32)
    palette = pal_ops.extract_palette(img, "grayness")
    ref = pal_ops.rgba_to_indexed(img, palette)
    ours = pal_pl.rgba_to_indexed_pallas(img, palette)
    np.testing.assert_array_equal(ours, ref)


def test_indexed_parity_unmatched_pixels():
    img = jnp.full((8, 8, 4), 7, jnp.int32)
    palette = jnp.full((256, 4), 99, jnp.int32)
    ours = pal_pl.rgba_to_indexed_pallas(img, palette)
    np.testing.assert_array_equal(np.asarray(ours), np.zeros((8, 8, 1)))


def test_indexed_batch():
    rng = np.random.default_rng(1)
    pool = rng.integers(0, 256, (5, 4)).astype(np.int32)
    imgs = jnp.asarray(pool[rng.integers(0, 5, (3, 16, 16))], jnp.int32)
    palettes = jnp.stack(
        [pal_ops.extract_palette(imgs[i], "top2bottom") for i in range(3)]
    )
    ours = pal_pl.rgba_to_indexed_pallas_batch(imgs, palettes)
    for i in range(3):
        ref = pal_ops.rgba_to_indexed(imgs[i], palettes[i])
        np.testing.assert_array_equal(ours[i], ref)
