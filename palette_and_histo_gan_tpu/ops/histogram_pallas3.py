"""Pallas TPU histogram BACKWARD, v3: blocked single-pass-per-channel.

Round 3's bandwidth accounting (docs/DESIGN.md) proved the XLA tri
backward's nine cotangent fusions are VPU-recompute-bound: each of the
three per-channel fusions rebuilds two (B, HW, size) kernel/slope
matrices in-fusion, ~37 elementwise ops per (B, HW, size) element across
the channel's three chains. A single pass that builds Ku/Kv once and
evaluates all three chains needs ~20 ops/element — but only a Mosaic
kernel can fuse that way (XLA will not multi-output-fuse three reduces
into one dot without materializing the 537 MB operand; measured as the
"dual"/"tri2b" negatives).

The v1/v2 Pallas attempts lost to per-program fixed costs: grid (B, 3,
tiles) is 12k+ single-image programs at ~1 us each (the augment kernel's
A/B measured 1024 single-image programs at 1.14 ms against a 0.2 ms
traffic floor). v3 applies the augment kernel's fix — BLOCK images per
program, loop channels inside — so the grid is B/block programs and the
kernel matrices are built exactly once per (image, channel).

Structure per program (block images; per image, per channel c with
projections (p1, p2) — triples from reference histogram.py:69-74):

    xu = du - t                 (size, HW) lane-full, bf16 chain
    ku = k(xu^2/s^2)            one build, shared by ALL chains
    m1[j,p] = sum_i gc[i,j] ku[i,p]     MXU: gc^T contraction
    da[i,p] = sum_j gc[i,j] kv[j,p]     MXU
    s_y  = sum_j (m1 kv)                 iy chain
    s_u  = -2/s^2 sum_i (da ku^2 xu)     iu chain (slope folded)
    s_v  = -2/s^2 sum_j (m1 kv^2 xv)     iv chain via dkv = iy * m1
    numer[c] += iy(s_u + s_v); numer[p1] -= iy s_u; numer[p2] -= iy s_v
    d_iy += s_y

Output is the (B, 4, HW) [numer_r, numer_g, numer_b, d_iy] block v2
established (the final division by (x + eps) and the Iy chain term run
in XLA — v1's on-hardware bisection found in-kernel division after the
dots crashes the Mosaic compiler). Gradient-exact vs the XLA tri
backward to bf16 reduction-order rounding; pinned in
tests/test_histogram_pallas.py. Selected by
`calculate_rgbuv_histogram(..., bwd="pallas")` (ops/histogram.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-6

_CHANNEL_TRIPLES = ((0, 1, 2), (1, 0, 2), (2, 0, 1))


def _domain_col(size: int) -> jnp.ndarray:
    """linspace(-3, 3, size) as an f32 (size, 1) column (integer iota —
    Mosaic has no float iota); bit-identical to jnp.linspace here."""
    steps = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0).astype(jnp.float32)
    return -3.0 + steps * (6.0 / (size - 1))


def _bwd3_kernel(
    logs_ref, iy_ref, g_ref, out_ref, *, size, method, sigma, dtype, block
):
    """logs_ref: (block, 3, HW) f32 log(x + eps) rows; iy_ref: (block, 1, HW)
    f32 intensities; g_ref: (block, 3, size, size) f32 cotangents of the
    unnormalized planes; out_ref: (block, 4, HW) f32."""
    sigma_sqr = sigma * sigma
    inv_s = jnp.asarray(1.0 / sigma_sqr, dtype)
    t = _domain_col(size).astype(dtype)

    for j in range(block):
        comps = tuple(logs_ref[j, k, :][None, :] for k in range(3))  # (1, HW) f32
        iy = iy_ref[j, 0, :][None, :]  # (1, HW) f32
        numer = [None, None, None]
        d_iy = None

        def acc(a, b):
            return b if a is None else a + b

        for ch, (c, p1, p2) in enumerate(_CHANNEL_TRIPLES):
            du = comps[c] - comps[p1]
            dv = comps[c] - comps[p2]
            xu = du.astype(dtype) - t  # (size, HW)
            xv = dv.astype(dtype) - t
            d2u = xu * xu * inv_s
            d2v = xv * xv * inv_s
            if method == "inverse-quadratic":
                # full-rate approximate reciprocal on the bf16 chain: its
                # ~2^-12 relative error sits below bf16's own 2^-8 rounding,
                # so gradient parity vs the XLA tri backward is unchanged
                # (pinned in tests); exact divide on the f32 parity path
                approx = jnp.dtype(dtype) == jnp.bfloat16
                ku = pl.reciprocal(
                    (1.0 + d2u).astype(jnp.float32), approx=approx
                ).astype(dtype)
                kv = pl.reciprocal(
                    (1.0 + d2v).astype(jnp.float32), approx=approx
                ).astype(dtype)
                # slope/k = -k * (2/s^2) x  (one extra k factor below)
                su_w = ku * (ku * xu)  # = k^2 x ; scaled by -2/s^2 after reduce
                sv_w = kv * (kv * xv)
            elif method == "RBF":
                ku = jnp.exp(-d2u)
                kv = jnp.exp(-d2v)
                su_w = ku * xu
                sv_w = kv * xv
            else:
                raise ValueError(f"unknown histogram method {method!r}")

            gc = g_ref[j, ch, :, :].astype(dtype)  # (size, size)
            # f32 accumulators are mandatory for tpu.matmul (a bf16
            # preferred_element_type fails Mosaic verification)
            # m1[j, p] = sum_i gc[i, j] ku[i, p]
            m1 = jax.lax.dot_general(
                gc, ku,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            # da[i, p] = sum_j gc[i, j] kv[j, p]
            da = jax.lax.dot_general(
                gc, kv,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)

            m1kv = m1 * kv
            s_y = jnp.sum(m1kv, axis=0, keepdims=True).astype(jnp.float32)
            s_u = jnp.sum(da * su_w, axis=0, keepdims=True).astype(jnp.float32)
            s_v = jnp.sum(m1 * sv_w, axis=0, keepdims=True).astype(jnp.float32)
            scale = -2.0 / sigma_sqr
            d_iu = iy * (scale * s_u)
            d_iv = iy * (scale * s_v)  # iy factored out of the dkv dot
            d_iy = acc(d_iy, s_y)
            numer[c] = acc(numer[c], d_iu + d_iv)
            numer[p1] = acc(numer[p1], -d_iu)
            numer[p2] = acc(numer[p2], -d_iv)

        out_ref[j, :, :] = jnp.concatenate(numer + [d_iy], axis=0)


def backward_unnormalized_pallas3(
    flat01: jnp.ndarray,  # (B, HW, 3) f32 pixels in [0, 1]
    g_unnorm: jnp.ndarray,  # (B, size, size, 3) cotangent, any float dtype
    size: int,
    method: str,
    sigma: float,
    dtype=jnp.bfloat16,
    block: int = 8,
) -> jnp.ndarray:
    """d(loss)/d(flat01) for the unnormalized histogram stack — Pallas core
    plus the cheap XLA finish (division + Iy chain, as ops/histogram.py)."""
    b, hw, _ = flat01.shape
    eps = EPSILON
    logs = jnp.moveaxis(jnp.log(flat01 + eps), -1, 1)  # (B, 3, HW) f32
    iy32 = jnp.sqrt(jnp.sum(jnp.square(flat01), axis=-1) + eps)  # (B, HW)
    g_cm = jnp.moveaxis(g_unnorm.astype(jnp.float32), -1, 1)  # (B, 3, size, size)

    if b % block != 0:
        block = 1
    kernel = functools.partial(
        _bwd3_kernel, size=size, method=method, sigma=sigma,
        dtype=jnp.dtype(dtype), block=block,
    )
    d = pl.pallas_call(
        kernel,
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec((block, 3, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block, 3, size, size), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block, 4, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 4, hw), jnp.float32),
    )(logs, iy32[:, None, :], g_cm)

    numer = jnp.moveaxis(d[:, 0:3, :], 1, -1)  # (B, HW, 3)
    d_iy = d[:, 3, :]  # (B, HW)
    return numer / (flat01 + eps) + (d_iy / iy32)[..., None] * flat01
