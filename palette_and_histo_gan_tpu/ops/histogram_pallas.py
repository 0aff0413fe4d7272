"""Fused Pallas TPU kernel for the differentiable RGB-uv histogram.

Grid = (batch, 3): each program computes one channel plane of the HistoGAN
histogram (ops/histogram.py math, reference histogram.py:5-81) from the
pixels held in VMEM — log-chroma projections, kernel matrices, and the
(size, HW) @ (HW, size) contraction on the MXU. None of the (HW, size)
intermediates ever touch HBM, and per-program VMEM stays ~6 MB (a single
program unrolling all three channels exceeds the 16 MB VMEM budget, which is
why the channel axis lives on the grid).

The backward pass is a custom VJP that *rematerializes* those intermediates
(cheaper than storing 6 x (HW, size) residuals per image); it accumulates the
three channels' pixel-gradients into one output block across the sequential
channel grid dimension.

The public entry `calculate_rgbuv_histogram_pallas` matches
`ops.histogram.calculate_rgbuv_histogram` (same [-1, 1] NHWC input, same
normalized (B, size, size, 3) output) and is parity-tested against it in
tests/test_histogram_pallas.py, including gradients.

Only the "inverse-quadratic" and "RBF" kernels of the reference are
supported; shapes are static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-6
_HI = jax.lax.Precision.HIGHEST


def _domain(size: int) -> jnp.ndarray:
    """linspace(-3, 3, size) as (1, size), built from an integer iota (Mosaic
    has no float iota) — bit-identical to jnp.linspace for these params."""
    steps = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1).astype(jnp.float32)
    return -3.0 + steps * (6.0 / (size - 1))


def _kernel_and_grad(d2_over_sigma, method: str):
    """k(d) given d^2/sigma^2; returns (k, dk/d(d^2/sigma^2))."""
    if method == "inverse-quadratic":
        k = 1.0 / (1.0 + d2_over_sigma)
        dk = -k * k
    elif method == "RBF":
        k = jnp.exp(-d2_over_sigma)
        dk = -k
    else:
        raise ValueError(f"unknown histogram method {method!r}")
    return k, dk


def _channel_projections(rgb, ch):
    """(component, proj1, proj2) columns for channel program `ch`.

    Triples (histogram.py:69-74): ch0 -> (r, g, b), ch1 -> (g, r, b),
    ch2 -> (b, r, g). Selected with elementwise `where` on the traced channel
    index (all three 1-lane columns are cheap to materialize)."""
    r, g, b = rgb[:, 0:1], rgb[:, 1:2], rgb[:, 2:3]
    c = jnp.where(ch == 0, r, jnp.where(ch == 1, g, b))
    p1 = jnp.where(ch == 0, g, r)
    p2 = jnp.where(ch == 2, g, b)
    return c, p1, p2


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(img_ref, out_ref, *, size, method, sigma):
    """img_ref: (1, HW, 3) pixels in [0, 1]; out_ref: (1, 1, size, size) —
    the plane of channel pl.program_id(1)."""
    eps = EPSILON
    sigma_sqr = sigma * sigma
    ch = pl.program_id(1)
    dom = _domain(size)

    rgb = img_ref[0, :, :].astype(jnp.float32)  # (HW, 3)
    c, p1, p2 = _channel_projections(rgb, ch)
    r, g, b = rgb[:, 0:1], rgb[:, 1:2], rgb[:, 2:3]
    iy = jnp.sqrt(r * r + g * g + b * b + eps)  # (HW, 1)

    iu = jnp.log(c + eps) - jnp.log(p1 + eps)  # (HW, 1)
    iv = jnp.log(c + eps) - jnp.log(p2 + eps)
    ku, _ = _kernel_and_grad(jnp.square(iu - dom) / sigma_sqr, method)
    kv, _ = _kernel_and_grad(jnp.square(iv - dom) / sigma_sqr, method)
    a = iy * ku  # (HW, size)
    out_ref[0, 0, :, :] = jax.lax.dot_general(
        a,
        kv,
        dimension_numbers=(((0,), (0,)), ((), ())),  # a^T @ kv
        preferred_element_type=jnp.float32,
        precision=_HI,
    )


def _forward_unnormalized(flat01: jnp.ndarray, size: int, method: str, sigma: float):
    """(B, HW, 3) in [0, 1] -> (B, 3, size, size) unnormalized histograms."""
    b, hw, _ = flat01.shape
    kernel = functools.partial(_fwd_kernel, size=size, method=method, sigma=sigma)
    return pl.pallas_call(
        kernel,
        grid=(b, 3),
        in_specs=[
            pl.BlockSpec((1, hw, 3), lambda i, ch: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, size, size), lambda i, ch: (i, ch, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, size, size), jnp.float32),
    )(flat01)


# ---------------------------------------------------------------------------
# Backward kernel (rematerializing, accumulates over the channel grid dim)
# ---------------------------------------------------------------------------


def _bwd_kernel(img_ref, g_ref, d_ref, *, size, method, sigma):
    """img_ref: (1, HW, 3); g_ref: (1, 1, size, size) cotangent of channel
    ch's unnormalized plane; d_ref: (1, HW, 6) block of a flat
    (B*3, HW, 6) output = [numer_r, numer_g, numer_b, d_iy, d_iy, d_iy],
    where numer_j is this channel's log-chroma numerator already scattered to
    column j (component gets d_iu + d_iv, proj1 gets -d_iu, proj2 gets -d_iv).

    The heavy work — two MXU contractions and the (HW, size) elementwise
    chains — happens here; the final division by (x + eps) and the Iy chain
    term happen in XLA in `_backward_unnormalized`. That split is deliberate:
    several algebraically-equivalent formulations (in-kernel division after
    both dots; emitting raw [d_iu, d_iv, d_iy]; 4D output blocks with two
    leading singleton dims) crash the v5e Mosaic compiler — this exact output
    shape was found compiling reliably by on-hardware bisection."""
    eps = EPSILON
    sigma_sqr = sigma * sigma
    ch = pl.program_id(1)
    dom = _domain(size)

    rgb = img_ref[0, :, :].astype(jnp.float32)
    r, g, b = rgb[:, 0:1], rgb[:, 1:2], rgb[:, 2:3]
    iy = jnp.sqrt(r * r + g * g + b * b + eps)
    c, p1, p2 = _channel_projections(rgb, ch)

    iu = jnp.log(c + eps) - jnp.log(p1 + eps)
    iv = jnp.log(c + eps) - jnp.log(p2 + eps)
    ku, dku = _kernel_and_grad(jnp.square(iu - dom) / sigma_sqr, method)
    kv, dkv = _kernel_and_grad(jnp.square(iv - dom) / sigma_sqr, method)

    gc = g_ref[0, 0, :, :].astype(jnp.float32)  # (size, size)
    # H = a^T @ kv with a = iy*ku;  dL/da = kv @ gc^T ; dL/dkv = a @ gc
    d_a = jax.lax.dot_general(
        kv, gc,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (HW, size)
    d_kv = jax.lax.dot_general(
        iy * ku, gc,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (HW, size)
    d_iy = jnp.sum(ku * d_a, axis=1, keepdims=True)  # (HW, 1)
    # k(d^2/s^2) chained through d = (I - dom): dk/dI = dk * 2 (I - dom)/s^2
    d_iu = jnp.sum(
        (iy * d_a) * dku * 2.0 * (iu - dom) / sigma_sqr, axis=1, keepdims=True
    )
    d_iv = jnp.sum(
        d_kv * dkv * 2.0 * (iv - dom) / sigma_sqr, axis=1, keepdims=True
    )

    c_idx = ch  # the component column IS the channel index (see triples)
    p1_idx = jnp.where(ch == 0, 1, 0)
    p2_idx = jnp.where(ch == 2, 1, 2)
    cols = [
        jnp.where(c_idx == j, d_iu + d_iv, jnp.where(p1_idx == j, -d_iu, -d_iv))
        for j in range(3)
    ]
    cols.extend([d_iy, d_iy, d_iy])
    d_ref[0, :, :] = jnp.concatenate(cols, axis=1)


_BWD_PIXEL_TILE = 1024  # pixels per backward program; the per-pixel math is
# row-independent, so tiling shrinks the per-program footprint (the Mosaic
# compiler rejects the full-HW backward above ~8 batch programs) and
# pipelines better


def _backward_unnormalized(flat01, g_unnorm, size, method, sigma):
    b, hw, _ = flat01.shape
    tile = _BWD_PIXEL_TILE if hw % _BWD_PIXEL_TILE == 0 else hw
    n_tiles = hw // tile
    kernel = functools.partial(_bwd_kernel, size=size, method=method, sigma=sigma)
    d = pl.pallas_call(
        kernel,
        grid=(b, 3, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, tile, 3), lambda i, ch, t: (i, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, size, size), lambda i, ch, t: (i, ch, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, 6), lambda i, ch, t: (i * 3 + ch, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * 3, hw, 6), jnp.float32),
    )(flat01, g_unnorm)
    d = d.reshape(b, 3, hw, 6)

    # cheap (B, HW, 3) finish in XLA: numer columns divided by (x + eps) plus
    # the Iy chain term d_iy * x / iy, summed over the three channel programs
    eps = EPSILON
    x = flat01
    iy = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)  # (B,HW,1)
    numer = jnp.sum(d[..., 0:3], axis=1)  # (B, HW, 3) over channels
    d_iy_total = jnp.sum(d[:, :, :, 3], axis=1)  # (B, HW): sum over channels
    return numer / (x + eps) + d_iy_total[..., None] * x / iy


# ---------------------------------------------------------------------------
# custom-VJP core on [0, 1] flattened pixels
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _hist_core(flat01, size, method, sigma):
    return _forward_unnormalized(flat01, size, method, sigma)


def _hist_core_fwd(flat01, size, method, sigma):
    return _forward_unnormalized(flat01, size, method, sigma), flat01


def _hist_core_bwd(size, method, sigma, flat01, g):
    return (_backward_unnormalized(flat01, g, size, method, sigma),)


_hist_core.defvjp(_hist_core_fwd, _hist_core_bwd)


def calculate_rgbuv_histogram_pallas(
    image_batch: jnp.ndarray,
    size: int = 64,
    method: str = "inverse-quadratic",
    sigma: float = 0.02,
) -> jnp.ndarray:
    """Drop-in fused replacement for ops.histogram.calculate_rgbuv_histogram."""
    b = image_batch.shape[0]
    rgb01 = image_batch[..., :3] * 0.5 + 0.5
    flat = jnp.reshape(rgb01, (b, -1, 3)).astype(jnp.float32)
    unnorm = _hist_core(flat, size, method, sigma)  # (B, 3, size, size)
    hist = jnp.moveaxis(unnorm, 1, -1)  # (B, size, size, 3)
    denom = jnp.sum(hist, axis=(1, 2, 3), keepdims=True)
    return hist / denom
