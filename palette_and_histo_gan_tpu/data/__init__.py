"""Device-resident data pipeline: one-time PNG decode, HBM-resident splits,
in-step epoch-permutation sampling."""

from .loader import (
    IndexedDataset,
    RgbaDataset,
    batch_indices,
    gather_indexed_batch,
    gather_rgba_batch,
    load_concat_split,
    load_split_arrays,
    make_indexed_datasets,
    make_rgba_datasets,
    prepare_rgba,
)

__all__ = [
    "IndexedDataset",
    "RgbaDataset",
    "batch_indices",
    "gather_indexed_batch",
    "gather_rgba_batch",
    "load_concat_split",
    "load_split_arrays",
    "make_indexed_datasets",
    "make_rgba_datasets",
    "prepare_rgba",
]
