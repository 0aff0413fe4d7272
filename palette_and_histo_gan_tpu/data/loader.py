"""Device-resident data pipeline.

The reference streams PNGs through tf.data on the host every epoch
(/root/reference/dataset_utils.py:209-246), re-decoding and re-extracting
palettes per sample per epoch. The whole dataset is 294 sprites x 4 poses x
64x64 RGBA ~= 4.6 MB — so the TPU-native design decodes every PNG exactly
once at startup, keeps the full split resident in HBM, and does sampling,
augmentation, and normalization *inside* the jitted train step. After
startup there are zero host->device transfers on the training path.

Palette extraction for the indexed variant runs once per pair on device
(vmapped static-shape kernel from ops.palette) instead of per-sample-per-epoch
on host (dataset_utils.py:131-151) — identical results for the deterministic
orderings; for "shuffled" the reference would re-shuffle each epoch, here the
shuffle is fixed per pair by a PRNG key (documented divergence).

PNG decode uses the native C extension when built (native/decode_png),
falling back to PIL.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    Config,
    DIRECTION_FOLDERS,
    TEST_SIZES,
    TRAIN_SIZES,
)
from ..ops import palette as palette_ops


def _decode_png(path: str) -> np.ndarray:
    """Decode one RGBA PNG to (H, W, 4) uint8."""
    try:
        from ..native import png_io

        arr = png_io.decode_png_rgba(path)
        if arr is not None:
            return arr
    except Exception:
        pass
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA"), dtype=np.uint8)


def load_split_arrays(
    data_root: str, split: str, direction: int, sizes=None
) -> np.ndarray:
    """All images of one pose for a split as (N, 64, 64, 4) uint8.

    Mirrors the path scheme datasets/<ds>/<train|test>/<i-dir>/<n>.png
    (dataset_utils.py:197-202).
    """
    if sizes is None:
        sizes = TRAIN_SIZES if split == "train" else TEST_SIZES
    n = sum(sizes)
    folder = os.path.join(data_root, split, DIRECTION_FOLDERS[direction])
    try:  # native batched decode: one C call for the whole split
        from ..native import png_io

        batch = png_io.decode_folder(folder, n)
        if batch is not None:
            return batch
    except Exception:
        pass
    images = np.zeros((n, 64, 64, 4), dtype=np.uint8)
    for i in range(n):
        images[i] = _decode_png(os.path.join(folder, f"{i}.png"))
    return images


def load_concat_split(config: Config, split: str, direction: int) -> np.ndarray:
    """One pose for a split across *all* configured dataset roots, as one
    (sum(sizes), 64, 64, 4) uint8 array in global-index order.

    TPU-native equivalent of the reference's per-sample dataset-index
    resolution over the imaginary concatenation of DATA_FOLDERS
    (dataset_utils.py:186-190 tf.while_loop over DATASET_SIZES;
    configuration.py:6,15-21): with every image decoded once up front, the
    while_loop collapses to loading each root's shard and concatenating.
    """
    roots = config.effective_data_roots
    sizes = config.train_sizes if split == "train" else config.test_sizes
    if len(roots) != len(sizes):
        raise ValueError(
            f"data_roots ({len(roots)}) and dataset_sizes ({len(sizes)}) "
            "must align 1:1"
        )
    parts = [
        load_split_arrays(root, split, direction, sizes=(n,))
        for root, n in zip(roots, sizes)
    ]
    return parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)


def prepare_rgba(images_u8: np.ndarray) -> np.ndarray:
    """uint8 -> uint8 [0, 255] with transparent pixels blackened.

    Blackening (dataset_utils.py:11-20) is deterministic, so it is applied
    once at load rather than per epoch. The split stays uint8 on device —
    every value is an exact 8-bit integer, so storing float32 would 4x the
    HBM residency and the per-step batch-gather traffic for nothing; the
    train step upcasts the gathered batch (fused into its first consumer).
    Normalization to [-1, 1] happens on device inside the step (after
    augmentation, matching the reference pipeline order at
    dataset_utils.py:213-222).
    """
    mask = images_u8[..., 3:4] == 0
    return np.where(mask, np.uint8(0), images_u8)


class RgbaDataset(NamedTuple):
    """A split resident on device: uint8 [0, 255], blackened."""

    sources: jnp.ndarray  # (N, 64, 64, 4)
    targets: jnp.ndarray  # (N, 64, 64, 4)

    @property
    def n(self) -> int:
        return self.sources.shape[0]


class IndexedDataset(NamedTuple):
    """Indexed-color split: per-pair joint palettes and index maps."""

    sources: jnp.ndarray  # (N, 64, 64, 1) int32
    targets: jnp.ndarray  # (N, 64, 64, 1) int32
    palettes: jnp.ndarray  # (N, 256, 4) int32

    @property
    def n(self) -> int:
        return self.sources.shape[0]


def make_rgba_datasets(config: Config) -> tuple[RgbaDataset, RgbaDataset]:
    """Device-resident equivalent of load_rgba_ds (dataset_utils.py:209-229)."""

    def build(split):
        src = prepare_rgba(load_concat_split(config, split, config.source_direction))
        tgt = prepare_rgba(load_concat_split(config, split, config.target_direction))
        return RgbaDataset(jnp.asarray(src), jnp.asarray(tgt))

    return build("train"), build("test")


def make_indexed_datasets(config: Config) -> tuple[IndexedDataset, IndexedDataset]:
    """Device-resident equivalent of load_indexed_ds (dataset_utils.py:232-246).

    Joint palettes (channel-concatenated pair, dataset_utils.py:141-145) are
    extracted once per pair with the vmapped static-shape kernel.
    """
    ordering = config.palette_ordering

    @jax.jit
    def index_pairs(src, tgt, keys):
        def one(s, t, k):
            pal = palette_ops.joint_palette_for_pair(s, t, ordering, key=k)
            return (
                palette_ops.rgba_to_indexed(s, pal),
                palette_ops.rgba_to_indexed(t, pal),
                pal,
            )

        return jax.vmap(one)(src, tgt, keys)

    def build(split, key):
        # the indexed loader reads images *unnormalized* and int-cast
        # (dataset_utils.py:138-139); blackening still applies (load_image)
        src = prepare_rgba(
            load_concat_split(config, split, config.source_direction)
        ).astype(np.int32)
        tgt = prepare_rgba(
            load_concat_split(config, split, config.target_direction)
        ).astype(np.int32)
        keys = jax.random.split(key, src.shape[0])
        s_idx, t_idx, pals = index_pairs(jnp.asarray(src), jnp.asarray(tgt), keys)
        return IndexedDataset(s_idx, t_idx, pals)

    k_train, k_test = jax.random.split(jax.random.PRNGKey(config.seed))
    return build("train", k_train), build("test", k_test)


# --------------------------------------------------------------------------
# In-step epoch-permutation sampling
# --------------------------------------------------------------------------


def batch_indices(
    key: jax.Array, step: jnp.ndarray, n: int, batch_size: int
) -> jnp.ndarray:
    """Indices of the batch for a global step, shuffling per epoch.

    Reproduces Dataset.range(n).shuffle(n).batch(B).repeat() semantics
    (dataset_utils.py:210-229): a fresh permutation each epoch, consumed in
    order. Static shapes require fixed batch size, so the reference's short
    final batch (250 % 4 = 2 images) instead wraps around the same epoch's
    permutation (documented divergence; identical coverage per epoch).
    """
    steps_per_epoch = -(-n // batch_size)  # ceil
    epoch = step // steps_per_epoch
    batch_in_epoch = step % steps_per_epoch
    perm = jax.random.permutation(jax.random.fold_in(key, epoch), n)
    flat = (batch_in_epoch * batch_size + jnp.arange(batch_size)) % n
    return perm[flat]


def gather_rgba_batch(ds: RgbaDataset, idx: jnp.ndarray):
    return ds.sources[idx], ds.targets[idx]


def gather_indexed_batch(ds: IndexedDataset, idx: jnp.ndarray):
    return ds.sources[idx], ds.targets[idx], ds.palettes[idx]
