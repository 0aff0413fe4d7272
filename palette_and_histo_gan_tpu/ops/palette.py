"""Static-shape palette extraction and indexed-color conversion.

TPU-native replacement for the reference's palette ops
(/root/reference/io_utils.py:25-103), which lean on
`tf.raw_ops.UniqueWithCountsV2` — a dynamic-output-shape op that cannot exist
under XLA. The design here is fully static:

  extract_palette:
    1. pack each RGBA pixel into one uint32 (r<<24 | g<<16 | b<<8 | a)
    2. lexicographic two-key sort (packed_value, pixel_index) — equal colors
       become contiguous, each run led by its first-occurrence pixel index
    3. run starts get their first-occurrence index as an order key; non-starts
       get a +inf sentinel
    4. a second sort by that order key yields the unique colors in order of
       first appearance — exactly UniqueWithCountsV2's output order — in the
       leading slots of a fixed 256-entry palette, hotpink-padded like the
       reference (io_utils.py:60-63)

  The four orderings reproduce io_utils.py:44-58 semantics:
    - "top2bottom":  first-appearance order scanning top-left -> bottom-right
    - "bottom2top":  first-appearance order of the reversed pixel scan
    - "grayness":    unique colors stably sorted by luma [0.2989, 0.5870,
                     0.1140, 0] ascending (fillers stay at the end; note the
                     reference's docstring claims frequency sorting but its
                     `count` output is never used — we reproduce the *actual*
                     behavior)
    - "shuffled":    random permutation of the unique colors (PRNG-keyed here
                     instead of TF's stateful tf.random.shuffle)

  rgba_to_indexed reproduces the broadcast-equality + scatter-sum semantics of
  io_utils.py:78-93 (unmatched pixels become index 0; a pixel matching several
  palette slots gets the *sum* of their indices, as tf.scatter_nd sums
  duplicate updates).

All shapes are static, so every function jits, vmaps, and shards cleanly.
Divergence from the reference (documented): images with more than 256 unique
colors are truncated to the first 256 by appearance order, where the reference
would crash (negative-length tf.repeat at io_utils.py:62).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INVALID_INDEX_COLOR, MAX_PALETTE_SIZE

# numpy (not jnp) on purpose: a module-level device array would initialize
# the JAX backend at import, which breaks the multi-host recipe — users must
# be able to `import palette_and_histo_gan_tpu` and THEN call
# parallel.distributed.initialize() (jax.distributed requires no backend to
# exist yet). jnp converts this at trace time. Luma weights: io_utils.py:52.
_GRAY_COEFFS = np.array([0.2989, 0.5870, 0.1140, 0.0], dtype=np.float32)


def pack_rgba(colors: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) int in [0, 255] -> (...,) uint32 (r<<24 | g<<16 | b<<8 | a)."""
    c = colors.astype(jnp.uint32)
    return (c[..., 0] << 24) | (c[..., 1] << 16) | (c[..., 2] << 8) | c[..., 3]


def unpack_rgba(packed: jnp.ndarray) -> jnp.ndarray:
    """(...,) uint32 -> (..., 4) int32 RGBA."""
    p = packed.astype(jnp.uint32)
    return jnp.stack(
        [
            (p >> 24) & 0xFF,
            (p >> 16) & 0xFF,
            (p >> 8) & 0xFF,
            p & 0xFF,
        ],
        axis=-1,
    ).astype(jnp.int32)


def _appearance_order_unique(packed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """First-appearance-ordered unique values of a flat uint32 array.

    Returns (palette_packed, valid) of shapes (MAX_PALETTE_SIZE,) and
    (MAX_PALETTE_SIZE,) bool. Static-shape UniqueWithCountsV2 equivalent.
    """
    n = packed.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    # lexicographic sort by (value, pixel index): runs of equal colors, each
    # led by its first occurrence
    sorted_v, sorted_i = jax.lax.sort((packed, idx), num_keys=2)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_v[1:] != sorted_v[:-1]]
    )
    order_key = jnp.where(is_start, sorted_i, n)  # sentinel pushes dupes last
    # sort unique colors by first-occurrence index
    order_sorted, palette_sorted = jax.lax.sort((order_key, sorted_v), num_keys=1)
    k = MAX_PALETTE_SIZE
    if n < k:  # fewer pixels than palette slots: pad with invalid sentinels
        pad = k - n
        order_sorted = jnp.concatenate(
            [order_sorted, jnp.full((pad,), n, order_sorted.dtype)]
        )
        palette_sorted = jnp.concatenate(
            [palette_sorted, jnp.zeros((pad,), palette_sorted.dtype)]
        )
    return palette_sorted[:k], order_sorted[:k] < n


def extract_palette(
    image: jnp.ndarray,
    palette_ordering: str = "top2bottom",
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Unique colors of an (H, W, C) image as a (256, C) int32 palette.

    `image` holds integers in [0, 255] (any int/float dtype); C is a multiple
    of 4 — the indexed dataset passes the channel-concatenated source+target
    (H, W, 8), whose reshape to (-1, 4) interleaves both images' RGBA rows
    exactly as io_utils.py:41-42 does.
    """
    flat = jnp.reshape(image.astype(jnp.int32), (-1, 4))
    if palette_ordering == "bottom2top":
        flat = flat[::-1]  # io_utils.py:48
    packed = pack_rgba(flat)
    palette_packed, valid = _appearance_order_unique(packed)

    if palette_ordering == "grayness":
        grayness = unpack_rgba(palette_packed).astype(jnp.float32) @ _GRAY_COEFFS
        sort_key = jnp.where(valid, grayness, jnp.inf)
        order = jnp.argsort(sort_key, stable=True)  # io_utils.py:50-55
        palette_packed = palette_packed[order]
        valid = valid[order]
    elif palette_ordering == "shuffled":
        if key is None:
            raise ValueError("palette_ordering='shuffled' requires a PRNG key")
        u = jax.random.uniform(key, (MAX_PALETTE_SIZE,))
        sort_key = jnp.where(valid, u, jnp.inf)
        order = jnp.argsort(sort_key)
        palette_packed = palette_packed[order]
        valid = valid[order]
    elif palette_ordering not in ("top2bottom", "bottom2top"):
        raise ValueError(f"unknown palette ordering {palette_ordering!r}")

    colors = unpack_rgba(palette_packed)
    filler = jnp.array(INVALID_INDEX_COLOR, dtype=jnp.int32)
    return jnp.where(valid[:, None], colors, filler)


def rgba_to_indexed(image: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 4) image -> (H, W, 1) int32 palette-index map.

    Semantics of io_utils.py:78-93: for each pixel, sum the indices of all
    palette entries equal to it (scatter_nd duplicate-sum); pixels matching
    nothing become 0.
    """
    h, w = image.shape[0], image.shape[1]
    px = pack_rgba(jnp.reshape(image.astype(jnp.int32), (-1, 4)))  # (N,)
    pal = pack_rgba(palette.astype(jnp.int32))  # (256,)
    eq = (px[:, None] == pal[None, :]).astype(jnp.int32)  # (N, 256)
    indices = eq @ jnp.arange(palette.shape[0], dtype=jnp.int32)
    return indices.reshape(h, w, 1)


def indexed_to_rgba(indexed_image: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 1) index map + (256, C) palette -> (H, W, C) image.

    Matches io_utils.py:96-103 (gather + reshape). Divergence (documented):
    for the scatter-sum quirk's out-of-range labels (> 255, see
    rgba_to_indexed) JAX's gather clamps to the last palette entry, while
    the reference's tf.gather would raise on CPU — the reference cannot
    decode such a map at all, so any in-bounds behavior here is new surface,
    and clamping is the benign choice.
    """
    h, w = indexed_image.shape[0], indexed_image.shape[1]
    out = palette[indexed_image.reshape(-1)]
    return out.reshape(h, w, palette.shape[-1])


def rgba_to_single_int(values_in_rgba: jnp.ndarray) -> jnp.ndarray:
    """Pack RGBA into one int32 with multipliers [2^24, 2^16, 2^8, 0].

    API-parity port of io_utils.py:68-75 (dead code in the reference; note its
    alpha multiplier is 0, a reference quirk kept verbatim). Uses uint32
    arithmetic then bitcasts so r >= 128 wraps like TF's int32 math.
    """
    v = values_in_rgba.astype(jnp.uint32)
    packed = (
        v[..., 0] * jnp.uint32(16777216)
        + v[..., 1] * jnp.uint32(65536)
        + v[..., 2] * jnp.uint32(256)
        + v[..., 3] * jnp.uint32(0)
    )
    return jax.lax.bitcast_convert_type(packed, jnp.int32)


# Batched variants -----------------------------------------------------------

extract_palette_batch = jax.vmap(
    partial(extract_palette, palette_ordering="grayness"), in_axes=0
)


def joint_palette_for_pair(
    source: jnp.ndarray,
    target: jnp.ndarray,
    palette_ordering: str,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Palette shared by a source/target pair (dataset_utils.py:141-145).

    Concatenating on channels before the (-1, 4) reshape interleaves the two
    images' pixels row-position-wise, which matters for appearance orderings —
    kept bit-identical to the reference.
    """
    concatenated = jnp.concatenate(
        [source.astype(jnp.int32), target.astype(jnp.int32)], axis=-1
    )
    return extract_palette(concatenated, palette_ordering, key)
