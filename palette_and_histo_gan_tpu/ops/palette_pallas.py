"""Pallas TPU kernel for palette quantization (rgba -> indexed).

The XLA path (ops/palette.py rgba_to_indexed) materializes an
(N_pixels, 256) equality matrix in HBM per image. This kernel holds the
packed 256-entry palette in VMEM and streams pixels through the VPU: for
each pixel, the sum of indices of equal palette slots (the reference's
scatter-sum semantics, io_utils.py:78-93) — one pass, no HBM intermediates.

Used by the indexed-variant dataset build (vmapped over pairs); parity-tested
against the XLA implementation in tests/test_palette_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MAX_PALETTE_SIZE
from .palette import pack_rgba


def _index_kernel(px_ref, pal_ref, out_ref, *, n_pixels):
    """px_ref: (1, N) packed uint32 pixels; pal_ref: (1, 256) packed palette;
    out_ref: (1, N) int32 index map."""
    px = px_ref[0, :].astype(jnp.int32)  # bit-equality works in any int type
    pal = pal_ref[0, :].astype(jnp.int32)
    # (N, 256) equality against the VMEM-resident palette, reduced on the fly
    eq = px[:, None] == pal[None, :]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, MAX_PALETTE_SIZE), 1)
    out_ref[0, :] = jnp.sum(
        jnp.where(eq, idx, 0), axis=1
    )


def rgba_to_indexed_pallas(image: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 4) image + (256, 4) palette -> (H, W, 1) int32 index map.

    Drop-in replacement for ops.palette.rgba_to_indexed.
    """
    h, w = image.shape[0], image.shape[1]
    n = h * w
    px = pack_rgba(jnp.reshape(image.astype(jnp.int32), (-1, 4)))[None, :]
    pal = pack_rgba(palette.astype(jnp.int32))[None, :]

    out = pl.pallas_call(
        functools.partial(_index_kernel, n_pixels=n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
    )(px, pal)
    return out[0].reshape(h, w, 1)


rgba_to_indexed_pallas_batch = jax.vmap(rgba_to_indexed_pallas, in_axes=(0, 0))
