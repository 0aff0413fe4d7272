"""Differentiable RGB-uv color histogram and histogram losses.

TPU-native equivalent of /root/reference/histogram.py (itself adapted from
HistoGAN). The math is reproduced exactly; shapes are static so XLA fuses the
log-chroma + kernel chain and maps the three (size, HW) @ (HW, size) batched
matmuls onto the MXU. A fused Pallas variant lives in
`histogram_pallas.py` with a numerical-parity test against this one.

Formulas (histogram.py:5-81):
  image in [-1, 1] -> rescaled to [0, 1]; alpha dropped
  Iy  = sqrt(R^2 + G^2 + B^2 + eps)
  Iu  = log(c + eps) - log(p1 + eps);  Iv = log(c + eps) - log(p2 + eps)
  k(d) = exp(-d^2/sigma^2)            ("RBF")
       = 1 / (1 + d^2/sigma^2)        ("inverse-quadratic", default)
  H_c = (Iy * Ku)^T @ Kv over a 64-bin domain linspace(-3, 3)
  channels (R, G, B) stacked then normalized to sum 1 per batch element
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-6


def _component_histogram(
    component: jnp.ndarray,  # (B, HW)
    projection1: jnp.ndarray,  # (B, HW)
    projection2: jnp.ndarray,  # (B, HW)
    color_intensities: jnp.ndarray,  # (B, HW, 1)
    histogram_domain: jnp.ndarray,  # (1, size)
    method: str,
    sigma_sqr: float,
    epsilon: float,
) -> jnp.ndarray:
    """One channel's (B, size, size) histogram plane (histogram.py:5-32)."""
    log_c = jnp.log(component + epsilon)
    iu = (log_c - jnp.log(projection1 + epsilon))[..., None]  # (B, HW, 1)
    iv = (log_c - jnp.log(projection2 + epsilon))[..., None]

    diff_u = jnp.square(iu - histogram_domain) / sigma_sqr  # (B, HW, size)
    diff_v = jnp.square(iv - histogram_domain) / sigma_sqr
    if method == "RBF":
        diff_u = jnp.exp(-diff_u)
        diff_v = jnp.exp(-diff_v)
    elif method == "inverse-quadratic":
        diff_u = 1.0 / (1.0 + diff_u)
        diff_v = 1.0 / (1.0 + diff_v)
    else:
        raise ValueError(f"unknown histogram method {method!r}")

    a = jnp.swapaxes(color_intensities * diff_u, 1, 2)  # (B, size, HW)
    # fp32-accurate matmul: the loss value feeds a sqrt-of-sum; bf16-grade
    # default precision would visibly shift Hellinger values vs the reference
    return jnp.matmul(a, diff_v, precision=jax.lax.Precision.HIGHEST)


def calculate_rgbuv_histogram(
    image_batch: jnp.ndarray,
    size: int = 64,
    method: str = "inverse-quadratic",
    sigma: float = 0.02,
) -> jnp.ndarray:
    """Differentiable color histogram of a [-1, 1] NHWC batch.

    Returns (B, size, size, 3), normalized to sum 1 per element
    (histogram.py:35-81).
    """
    epsilon = EPSILON
    sigma_sqr = sigma**2
    histogram_domain = jnp.linspace(-3.0, 3.0, num=size)[None, :]  # (1, size)

    image_batch = image_batch * 0.5 + 0.5  # [-1,1] -> [0,1]
    image_batch = image_batch[..., :3]  # drop alpha

    b = image_batch.shape[0]
    flat = jnp.reshape(image_batch, (b, -1, 3))  # (B, HW, 3)
    intensities = jnp.sqrt(
        jnp.square(flat[..., 0])
        + jnp.square(flat[..., 1])
        + jnp.square(flat[..., 2])
        + epsilon
    )[..., None]  # (B, HW, 1)

    red, green, blue = flat[..., 0], flat[..., 1], flat[..., 2]
    args = (histogram_domain, method, sigma_sqr, epsilon)
    hist_r = _component_histogram(red, green, blue, intensities, *args)
    hist_g = _component_histogram(green, red, blue, intensities, *args)
    hist_b = _component_histogram(blue, red, green, intensities, *args)
    histograms = jnp.stack([hist_r, hist_g, hist_b], axis=-1)

    denominator = jnp.sum(histograms, axis=(1, 2, 3), keepdims=True)
    return histograms / denominator


def hellinger_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """(1/sqrt(2)) * ||sqrt(H_pred) - sqrt(H_true)||_2 / B (histogram.py:84-89)."""
    batch_size = y_true.shape[0]
    return (
        1.0
        / jnp.sqrt(2.0)
        * jnp.sqrt(jnp.sum(jnp.square(jnp.sqrt(y_pred) - jnp.sqrt(y_true))))
    ) / batch_size


def l1_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (histogram.py:92-93)."""
    return jnp.mean(jnp.abs(y_true - y_pred))


def l2_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error (histogram.py:96-97)."""
    return jnp.mean(jnp.square(y_true - y_pred))
