"""Pure-JAX pixel ops: normalization and transparency handling.

TPU-native equivalents of the reference's image transforms
(/root/reference/dataset_utils.py:11-60). All functions are pure, shape-
preserving, and fusable by XLA into whatever pipeline they are embedded in;
they operate on float32 NHWC (or HWC) RGBA tensors.
"""

from __future__ import annotations

import jax.numpy as jnp


def blacken_transparent_pixels(image: jnp.ndarray) -> jnp.ndarray:
    """Zero every channel of fully transparent pixels (alpha == 0).

    Matches dataset_utils.py:11-20: some sprites carry colors in transparent
    pixels; the reference forces them to transparent-black so the network
    never sees them.
    """
    mask = image[..., 3:4] == 0
    return jnp.where(mask, jnp.zeros_like(image), image)


def replace_alpha_with_white(image: jnp.ndarray) -> jnp.ndarray:
    """Make fully transparent pixels white and drop the alpha channel.

    Matches dataset_utils.py:24-36 (dead code in the reference, kept for
    API parity).
    """
    mask = image[..., 3:4] == 0
    image = jnp.where(mask, jnp.full_like(image, 255.0), image)
    return image[..., :3]


def normalize(image: jnp.ndarray) -> jnp.ndarray:
    """[0, 255] -> [-1, 1] (dataset_utils.py:39-48)."""
    return image / 127.5 - 1.0


def denormalize(image: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 255] (dataset_utils.py:51-60)."""
    return (image + 1.0) * 127.5
