import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palette_and_histo_gan_tpu.config import INVALID_INDEX_COLOR, MAX_PALETTE_SIZE
from palette_and_histo_gan_tpu.ops import palette as pal_ops

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} missing; run scripts/make_golden.py")
    return np.load(path)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    colors = jnp.asarray(rng.integers(0, 256, (100, 4)), jnp.int32)
    packed = pal_ops.pack_rgba(colors)
    np.testing.assert_array_equal(pal_ops.unpack_rgba(packed), colors)


@pytest.mark.parametrize("ordering", ["top2bottom", "bottom2top", "grayness"])
def test_extract_palette_matches_tf_unique(ordering):
    g = _load("palette")
    out = pal_ops.extract_palette(jnp.asarray(g["image"]), ordering)
    np.testing.assert_array_equal(out, g[ordering])


def test_extract_palette_shape_and_filler():
    img = jnp.zeros((8, 8, 4), jnp.int32)  # single color
    out = pal_ops.extract_palette(img, "top2bottom")
    assert out.shape == (MAX_PALETTE_SIZE, 4)
    np.testing.assert_array_equal(out[0], [0, 0, 0, 0])
    np.testing.assert_array_equal(out[1], list(INVALID_INDEX_COLOR))
    np.testing.assert_array_equal(out[255], list(INVALID_INDEX_COLOR))


def test_extract_palette_appearance_order():
    # pixel scan order: colors appear as A, B, A, C -> palette [A, B, C, ...]
    a, b, c = [1, 2, 3, 4], [5, 6, 7, 8], [9, 10, 11, 12]
    img = jnp.asarray([[a, b], [a, c]], jnp.int32)
    out = pal_ops.extract_palette(img, "top2bottom")
    np.testing.assert_array_equal(out[:3], [a, b, c])
    out = pal_ops.extract_palette(img, "bottom2top")
    np.testing.assert_array_equal(out[:3], [c, a, b])


def test_extract_palette_shuffled_preserves_colors():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 4, (8, 8, 4)) * 60, jnp.int32)
    base = pal_ops.extract_palette(img, "top2bottom")
    shuf = pal_ops.extract_palette(img, "shuffled", key=jax.random.PRNGKey(0))
    # same color multiset in the valid region, fillers at the end
    n_valid = int(np.sum(~np.all(np.asarray(base) == INVALID_INDEX_COLOR, -1)))
    base_set = {tuple(r) for r in np.asarray(base[:n_valid])}
    shuf_set = {tuple(r) for r in np.asarray(shuf[:n_valid])}
    assert base_set == shuf_set
    np.testing.assert_array_equal(shuf[n_valid:], base[n_valid:])


def test_rgba_to_indexed_matches_reference_semantics():
    g = _load("indexed")
    out = pal_ops.rgba_to_indexed(jnp.asarray(g["image"]), jnp.asarray(g["palette"]))
    np.testing.assert_array_equal(out, g["expected"])


def test_rgba_indexed_roundtrip():
    rng = np.random.default_rng(2)
    pool = rng.integers(0, 256, (7, 4)).astype(np.int32)
    img = jnp.asarray(pool[rng.integers(0, 7, (16, 16))], jnp.int32)
    palette = pal_ops.extract_palette(img, "grayness")
    idx = pal_ops.rgba_to_indexed(img, palette)
    assert idx.shape == (16, 16, 1)
    back = pal_ops.indexed_to_rgba(idx, palette)
    np.testing.assert_array_equal(back, img)


def test_unmatched_pixel_becomes_zero():
    img = jnp.full((2, 2, 4), 11, jnp.int32)
    palette = jnp.full((MAX_PALETTE_SIZE, 4), 99, jnp.int32)
    idx = pal_ops.rgba_to_indexed(img, palette)
    np.testing.assert_array_equal(idx, np.zeros((2, 2, 1), np.int32))


def test_joint_palette_interleaving():
    # source all-A, target all-B: concatenated reshape interleaves rows A,B,A,B...
    a, b = [1, 1, 1, 255], [2, 2, 2, 255]
    src = jnp.asarray(np.broadcast_to(a, (4, 4, 4)), jnp.int32)
    tgt = jnp.asarray(np.broadcast_to(b, (4, 4, 4)), jnp.int32)
    pal = pal_ops.joint_palette_for_pair(src, tgt, "top2bottom")
    np.testing.assert_array_equal(pal[:2], [a, b])


def test_rgba_to_single_int():
    v = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    out = pal_ops.rgba_to_single_int(v)
    # alpha multiplier is 0 (reference quirk, io_utils.py:73)
    assert int(out[0]) == 1 * 16777216 + 2 * 65536 + 3 * 256


def test_extract_palette_jits():
    img = jnp.zeros((64, 64, 4), jnp.int32)
    fn = jax.jit(lambda x: pal_ops.extract_palette(x, "grayness"))
    out = fn(img)
    assert out.shape == (MAX_PALETTE_SIZE, 4)
