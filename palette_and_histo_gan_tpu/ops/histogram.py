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

from functools import partial

import jax
import jax.numpy as jnp

EPSILON = 1e-6

# channel -> (component, projection1, projection2) index triples: R uses
# (r, g, b), G uses (g, r, b), B uses (b, r, g) (histogram.py:60-74)
_CHANNEL_TRIPLES = ((0, 1, 2), (1, 0, 2), (2, 0, 1))


def _component_histogram(
    log_c: jnp.ndarray,  # (B, HW) log(component + eps), float32
    log_p1: jnp.ndarray,  # (B, HW)
    log_p2: jnp.ndarray,  # (B, HW)
    color_intensities: jnp.ndarray,  # (B, HW, 1), compute dtype
    histogram_domain: jnp.ndarray,  # (1, size), compute dtype
    method: str,
    sigma_sqr: float,
    dtype,
) -> jnp.ndarray:
    """One channel's (B, size, size) histogram plane (histogram.py:5-32).

    The (B, HW, size) kernel-matrix chain runs in `dtype`: float32 matches
    the reference bit-closely; bfloat16 halves the dominant HBM traffic and
    uses native-bf16 MXU passes (~3.5x faster at batch 1024, loss value
    within ~0.1%). The matmul always accumulates in float32.
    """
    iu = (log_c - log_p1)[..., None].astype(dtype)  # (B, HW, 1)
    iv = (log_c - log_p2)[..., None].astype(dtype)

    diff_u = jnp.square(iu - histogram_domain) / jnp.asarray(sigma_sqr, dtype)
    diff_v = jnp.square(iv - histogram_domain) / jnp.asarray(sigma_sqr, dtype)
    if method == "RBF":
        diff_u = jnp.exp(-diff_u)
        diff_v = jnp.exp(-diff_v)
    elif method == "inverse-quadratic":
        diff_u = 1.0 / (1.0 + diff_u)
        diff_v = 1.0 / (1.0 + diff_v)
    else:
        raise ValueError(f"unknown histogram method {method!r}")
    diff_u = diff_u.astype(dtype)
    diff_v = diff_v.astype(dtype)

    a = jnp.swapaxes(color_intensities * diff_u, 1, 2)  # (B, size, HW)
    # fp32-accurate accumulation: the loss value feeds a sqrt-of-sum; the
    # bf16-grade default precision would visibly shift Hellinger values
    precision = (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    )
    return jnp.matmul(
        a, diff_v, preferred_element_type=jnp.float32, precision=precision
    )


def _unnormalized_histograms(flat01, size, method, sigma, dtype):
    """(B, HW, 3) pixels in [0, 1] -> stacked unnormalized (B, size, size, 3)."""
    epsilon = EPSILON
    sigma_sqr = sigma**2
    histogram_domain = jnp.linspace(-3.0, 3.0, num=size)[None, :].astype(dtype)
    intensities = jnp.sqrt(
        jnp.square(flat01[..., 0])
        + jnp.square(flat01[..., 1])
        + jnp.square(flat01[..., 2])
        + epsilon
    )[..., None].astype(dtype)  # (B, HW, 1)

    # per-pixel logs in float32 (HW-sized, cheap, accuracy-critical)
    logs = jnp.log(flat01 + epsilon)
    log_r, log_g, log_b = logs[..., 0], logs[..., 1], logs[..., 2]
    args = (histogram_domain, method, sigma_sqr, dtype)
    hist_r = _component_histogram(log_r, log_g, log_b, intensities, *args)
    hist_g = _component_histogram(log_g, log_r, log_b, intensities, *args)
    hist_b = _component_histogram(log_b, log_r, log_g, intensities, *args)
    return jnp.stack([hist_r, hist_g, hist_b], axis=-1)


def _kernel_and_slope(diff, domain, method, sigma_sqr, dtype):
    """Kernel K(diff - t) and its derivative dK/d(diff), both (B, HW, size)."""
    x = diff[..., None].astype(dtype) - domain
    d = jnp.square(x) / jnp.asarray(sigma_sqr, dtype)
    if method == "RBF":
        k = jnp.exp(-d)
        kp = -k  # dk/d(d^2/sigma^2)
    elif method == "inverse-quadratic":
        k = 1.0 / (1.0 + d)
        kp = -k * k
    else:
        raise ValueError(f"unknown histogram method {method!r}")
    slope = kp * jnp.asarray(2.0 / sigma_sqr, dtype) * x
    return k, slope


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _histogram_core(flat01, size, method, sigma, dtype):
    """Unnormalized histograms with a hand-structured backward.

    XLA's autodiff backward materializes each (B, HW, size) cotangent dot
    result to HBM and re-reads it from several per-pixel reduce fusions —
    measured ~11.5 ms/step of the batch-1024 train step, nearly all of it
    HBM traffic. This VJP computes three dots per channel, each consumed by
    EXACTLY ONE elementwise+reduce chain, so XLA can output-fuse the
    reduction into the dot (the same dot+reduce fusion it already builds for
    conv + InstanceNorm statistics) instead of round-tripping 537 MB tensors:

      dL/d iy[p]  = sum_j (Ku @ G)[p,j]        * Kv[p,j]
      dL/d iu[p]  = iy * sum_i (Kv @ G^T)[p,i] * K'u[p,i]
      dL/d iv[p]  = sum_j ((iy Ku) @ G)[p,j]   * K'v[p,j]

    (The autodiff form uses Kv @ G^T for BOTH the iy and iu chains — the
    double consumer is what forces materialization; the algebraically equal
    Ku @ G form gives the iy chain its own dot.) Values match the autodiff
    gradient to reduction-order rounding; pinned in tests/test_histogram.py.
    """
    return _unnormalized_histograms(flat01, size, method, sigma, dtype)


def _histogram_core_fwd(flat01, size, method, sigma, dtype):
    return _unnormalized_histograms(flat01, size, method, sigma, dtype), flat01


def _histogram_core_bwd(size, method, sigma, dtype, flat01, g):
    epsilon = EPSILON
    sigma_sqr = sigma**2
    domain = jnp.linspace(-3.0, 3.0, num=size)[None, :].astype(dtype)
    iy32 = jnp.sqrt(jnp.sum(jnp.square(flat01), axis=-1) + epsilon)  # (B, HW)
    iy = iy32[..., None].astype(dtype)
    logs = jnp.log(flat01 + epsilon)
    comps = (logs[..., 0], logs[..., 1], logs[..., 2])
    g = g.astype(dtype)  # (B, size, size, 3)

    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    mm = partial(jnp.einsum, precision=precision)

    d_log = [None, None, None]  # (B, HW) f32 accumulators per RGB component
    d_iy = None

    def acc(a, b):
        return b if a is None else a + b

    for ch, (c, p1, p2) in enumerate(_CHANNEL_TRIPLES):
        iu = comps[c] - comps[p1]
        iv = comps[c] - comps[p2]
        ku, su = _kernel_and_slope(iu, domain, method, sigma_sqr, dtype)
        kv, sv = _kernel_and_slope(iv, domain, method, sigma_sqr, dtype)
        gc = g[..., ch]  # (B, size, size): rows index u-bins, cols v-bins
        m1 = mm("bpi,bij->bpj", ku, gc)  # sole producer for the iy chain
        da = mm("bpj,bij->bpi", kv, gc)  # sole producer for the iu chain
        dkv = mm("bpi,bij->bpj", iy * ku, gc)  # sole producer for the iv chain
        s_y = jnp.sum(m1 * kv, axis=-1).astype(jnp.float32)
        s_u = jnp.sum(da * su, axis=-1).astype(jnp.float32)
        s_v = jnp.sum(dkv * sv, axis=-1).astype(jnp.float32)
        d_iu = iy32 * s_u
        d_iv = s_v
        d_iy = acc(d_iy, s_y)
        d_log[c] = acc(d_log[c], d_iu + d_iv)
        d_log[p1] = acc(d_log[p1], -d_iu)
        d_log[p2] = acc(d_log[p2], -d_iv)

    d_flat = (
        jnp.stack(d_log, axis=-1) / (flat01 + epsilon)
        + (d_iy / iy32)[..., None] * flat01
    )
    return (d_flat,)


_histogram_core.defvjp(_histogram_core_fwd, _histogram_core_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _histogram_core_dual(flat01, size, method, sigma, dtype):
    """Two-dot backward variant of _histogram_core (A/B alternative).

    Drops the Ku@G dot: since DKV = (iy Ku)@G, the iy chain is recoverable as
      dL/d iy[p] = (sum_j DKV[p,j] Kv[p,j]) / iy[p]
    (iy >= sqrt(eps) > 0 always). DKV then feeds TWO reduces (iy and iv
    chains) — one fewer 537 MB dot write per channel in exchange for a
    double consumer XLA may or may not multi-output-fuse. Selected by
    `calculate_rgbuv_histogram(..., bwd="dual")`; device-clock A/B decides
    the default."""
    return _unnormalized_histograms(flat01, size, method, sigma, dtype)


def _histogram_core_dual_bwd(size, method, sigma, dtype, flat01, g):
    epsilon = EPSILON
    sigma_sqr = sigma**2
    domain = jnp.linspace(-3.0, 3.0, num=size)[None, :].astype(dtype)
    iy32 = jnp.sqrt(jnp.sum(jnp.square(flat01), axis=-1) + epsilon)  # (B, HW)
    iy = iy32[..., None].astype(dtype)
    logs = jnp.log(flat01 + epsilon)
    comps = (logs[..., 0], logs[..., 1], logs[..., 2])
    g = g.astype(dtype)

    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    mm = partial(jnp.einsum, precision=precision)

    d_log = [None, None, None]
    d_iy = None

    def acc(a, b):
        return b if a is None else a + b

    for ch, (c, p1, p2) in enumerate(_CHANNEL_TRIPLES):
        iu = comps[c] - comps[p1]
        iv = comps[c] - comps[p2]
        ku, su = _kernel_and_slope(iu, domain, method, sigma_sqr, dtype)
        kv, sv = _kernel_and_slope(iv, domain, method, sigma_sqr, dtype)
        gc = g[..., ch]
        da = mm("bpj,bij->bpi", kv, gc)  # iu chain
        dkv = mm("bpi,bij->bpj", iy * ku, gc)  # iy + iv chains
        s_yk = jnp.sum(dkv * kv, axis=-1).astype(jnp.float32)  # = iy * s_y
        s_u = jnp.sum(da * su, axis=-1).astype(jnp.float32)
        s_v = jnp.sum(dkv * sv, axis=-1).astype(jnp.float32)
        d_iu = iy32 * s_u
        d_iv = s_v
        d_iy = acc(d_iy, s_yk / iy32)
        d_log[c] = acc(d_log[c], d_iu + d_iv)
        d_log[p1] = acc(d_log[p1], -d_iu)
        d_log[p2] = acc(d_log[p2], -d_iv)

    d_flat = (
        jnp.stack(d_log, axis=-1) / (flat01 + epsilon)
        + (d_iy / iy32)[..., None] * flat01
    )
    return (d_flat,)


_histogram_core_dual.defvjp(_histogram_core_fwd, _histogram_core_dual_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _histogram_core_tri2(flat01, size, method, sigma, dtype):
    """Two-dot backward exploiting dkv = iy * m1 (A/B alternative).

    The tri backward's third dot is algebraically redundant: iy does not
    depend on the contraction index, so

      DKV[p,j] = sum_i (iy[p] Ku[p,i]) G[i,j] = iy[p] * (Ku @ G)[p,j]
               = iy[p] * M1[p,j]

    — the iv chain's dot IS the iy chain's dot, row-scaled. This variant
    drops it (9 dots -> 6 across the three channels) and reduces M1 against
    the STACKED weights [Kv; K'v] in a single sum (one consumer, so the
    dot+reduce output fusion is preserved, unlike "dual" whose shared dot
    gains a second reduce consumer and materializes the 537 MB operand).
    Kv and K'v share their x/d subexpressions inside the one epilogue.
    Selected by `calculate_rgbuv_histogram(..., bwd="tri2")`."""
    return _unnormalized_histograms(flat01, size, method, sigma, dtype)


def _histogram_core_tri2_bwd(size, method, sigma, dtype, flat01, g):
    epsilon = EPSILON
    sigma_sqr = sigma**2
    domain = jnp.linspace(-3.0, 3.0, num=size)[None, :].astype(dtype)
    iy32 = jnp.sqrt(jnp.sum(jnp.square(flat01), axis=-1) + epsilon)  # (B, HW)
    logs = jnp.log(flat01 + epsilon)
    comps = (logs[..., 0], logs[..., 1], logs[..., 2])
    g = g.astype(dtype)

    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    mm = partial(jnp.einsum, precision=precision)

    d_log = [None, None, None]
    d_iy = None

    def acc(a, b):
        return b if a is None else a + b

    for ch, (c, p1, p2) in enumerate(_CHANNEL_TRIPLES):
        iu = comps[c] - comps[p1]
        iv = comps[c] - comps[p2]
        ku, su = _kernel_and_slope(iu, domain, method, sigma_sqr, dtype)
        kv, sv = _kernel_and_slope(iv, domain, method, sigma_sqr, dtype)
        gc = g[..., ch]
        m1 = mm("bpi,bij->bpj", ku, gc)  # iy + iv chains (dkv = iy * m1)
        da = mm("bpj,bij->bpi", kv, gc)  # iu chain
        w = jnp.stack([kv, sv], axis=-1)  # (B, HW, size, 2)
        s_yv = jnp.sum(m1[..., None] * w, axis=2).astype(jnp.float32)
        s_u = jnp.sum(da * su, axis=-1).astype(jnp.float32)
        d_iu = iy32 * s_u
        d_iv = iy32 * s_yv[..., 1]  # iy factored out of the dropped dot
        d_iy = acc(d_iy, s_yv[..., 0])
        d_log[c] = acc(d_log[c], d_iu + d_iv)
        d_log[p1] = acc(d_log[p1], -d_iu)
        d_log[p2] = acc(d_log[p2], -d_iv)

    d_flat = (
        jnp.stack(d_log, axis=-1) / (flat01 + epsilon)
        + (d_iy / iy32)[..., None] * flat01
    )
    return (d_flat,)


_histogram_core_tri2.defvjp(_histogram_core_fwd, _histogram_core_tri2_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _histogram_core_tri2b(flat01, size, method, sigma, dtype):
    """tri2 with two plain reduces of M1 instead of the stacked-weights sum.

    Same 6-dot algebra as tri2, but leaves M1 with two separate reduce
    consumers and lets XLA's multi-output fuser decide — measures whether
    the stack layout or the sibling fusion is the better structure.
    Selected by `calculate_rgbuv_histogram(..., bwd="tri2b")`."""
    return _unnormalized_histograms(flat01, size, method, sigma, dtype)


def _histogram_core_tri2b_bwd(size, method, sigma, dtype, flat01, g):
    epsilon = EPSILON
    sigma_sqr = sigma**2
    domain = jnp.linspace(-3.0, 3.0, num=size)[None, :].astype(dtype)
    iy32 = jnp.sqrt(jnp.sum(jnp.square(flat01), axis=-1) + epsilon)
    logs = jnp.log(flat01 + epsilon)
    comps = (logs[..., 0], logs[..., 1], logs[..., 2])
    g = g.astype(dtype)

    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    mm = partial(jnp.einsum, precision=precision)

    d_log = [None, None, None]
    d_iy = None

    def acc(a, b):
        return b if a is None else a + b

    for ch, (c, p1, p2) in enumerate(_CHANNEL_TRIPLES):
        iu = comps[c] - comps[p1]
        iv = comps[c] - comps[p2]
        ku, su = _kernel_and_slope(iu, domain, method, sigma_sqr, dtype)
        kv, sv = _kernel_and_slope(iv, domain, method, sigma_sqr, dtype)
        gc = g[..., ch]
        m1 = mm("bpi,bij->bpj", ku, gc)
        da = mm("bpj,bij->bpi", kv, gc)
        s_y = jnp.sum(m1 * kv, axis=-1).astype(jnp.float32)
        s_vr = jnp.sum(m1 * sv, axis=-1).astype(jnp.float32)
        s_u = jnp.sum(da * su, axis=-1).astype(jnp.float32)
        d_iu = iy32 * s_u
        d_iv = iy32 * s_vr
        d_iy = acc(d_iy, s_y)
        d_log[c] = acc(d_log[c], d_iu + d_iv)
        d_log[p1] = acc(d_log[p1], -d_iu)
        d_log[p2] = acc(d_log[p2], -d_iv)

    d_flat = (
        jnp.stack(d_log, axis=-1) / (flat01 + epsilon)
        + (d_iy / iy32)[..., None] * flat01
    )
    return (d_flat,)


_histogram_core_tri2b.defvjp(_histogram_core_fwd, _histogram_core_tri2b_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _histogram_core_tri2c(flat01, size, method, sigma, dtype):
    """tri2 with the two weight planes concatenated on the BIN axis.

    Same 6-dot algebra as tri2 (dkv = iy * m1), but the double reduce of M1
    is expressed as ONE consumer chain that keeps full (128-wide) lanes:
    concat([Kv, K'v]) and [M1, M1] on the bin axis -> elementwise multiply
    -> reshape (B, HW, 2, size) -> reduce the bin axis. A single consumer
    preserves the dot+reduce output fusion (unlike tri2b) without the
    minor-dim-2 layout of tri2's stack. Selected by bwd="tri2c"."""
    return _unnormalized_histograms(flat01, size, method, sigma, dtype)


def _histogram_core_tri2c_bwd(size, method, sigma, dtype, flat01, g):
    epsilon = EPSILON
    sigma_sqr = sigma**2
    domain = jnp.linspace(-3.0, 3.0, num=size)[None, :].astype(dtype)
    iy32 = jnp.sqrt(jnp.sum(jnp.square(flat01), axis=-1) + epsilon)
    logs = jnp.log(flat01 + epsilon)
    comps = (logs[..., 0], logs[..., 1], logs[..., 2])
    g = g.astype(dtype)
    b, hw = iy32.shape

    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    mm = partial(jnp.einsum, precision=precision)

    d_log = [None, None, None]
    d_iy = None

    def acc(a, b):
        return b if a is None else a + b

    for ch, (c, p1, p2) in enumerate(_CHANNEL_TRIPLES):
        iu = comps[c] - comps[p1]
        iv = comps[c] - comps[p2]
        ku, su = _kernel_and_slope(iu, domain, method, sigma_sqr, dtype)
        kv, sv = _kernel_and_slope(iv, domain, method, sigma_sqr, dtype)
        gc = g[..., ch]
        m1 = mm("bpi,bij->bpj", ku, gc)
        da = mm("bpj,bij->bpi", kv, gc)
        w = jnp.concatenate([kv, sv], axis=-1)  # (B, HW, 2*size)
        m2 = jnp.concatenate([m1, m1], axis=-1)
        s = jnp.sum(
            (m2 * w).reshape(b, hw, 2, size), axis=-1
        ).astype(jnp.float32)  # (B, HW, 2): [:, :, 0]=iy chain, 1=iv chain
        s_u = jnp.sum(da * su, axis=-1).astype(jnp.float32)
        d_iu = iy32 * s_u
        d_iv = iy32 * s[..., 1]
        d_iy = acc(d_iy, s[..., 0])
        d_log[c] = acc(d_log[c], d_iu + d_iv)
        d_log[p1] = acc(d_log[p1], -d_iu)
        d_log[p2] = acc(d_log[p2], -d_iv)

    d_flat = (
        jnp.stack(d_log, axis=-1) / (flat01 + epsilon)
        + (d_iy / iy32)[..., None] * flat01
    )
    return (d_flat,)


_histogram_core_tri2c.defvjp(_histogram_core_fwd, _histogram_core_tri2c_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _histogram_core_pallas_bwd(flat01, size, method, sigma, dtype):
    """XLA forward + blocked Pallas single-pass backward (A/B alternative).

    The forward is the identical `_unnormalized_histograms` chain (XLA is
    already at its floor there); only the gradient swaps in the Mosaic
    kernel of `histogram_pallas3.py`, which builds each (size, HW) kernel/
    slope matrix ONCE per (image, channel) and evaluates all three chains
    in a single VMEM pass (~20 VPU ops/element vs the ~37 the tri
    backward's three separate fusions spend on in-fusion rebuilds — see
    docs/DESIGN.md bandwidth accounting). Selected by
    `calculate_rgbuv_histogram(..., bwd="pallas")`."""
    return _unnormalized_histograms(flat01, size, method, sigma, dtype)


def _histogram_core_pallas_bwd_bwd(size, method, sigma, dtype, flat01, g):
    from .histogram_pallas3 import backward_unnormalized_pallas3

    return (
        backward_unnormalized_pallas3(
            flat01, g, size, method, sigma, dtype=dtype
        ),
    )


_histogram_core_pallas_bwd.defvjp(_histogram_core_fwd, _histogram_core_pallas_bwd_bwd)

_BWD_CORES = {
    "tri": _histogram_core,
    "dual": _histogram_core_dual,
    "tri2": _histogram_core_tri2,
    "tri2b": _histogram_core_tri2b,
    "tri2c": _histogram_core_tri2c,
    "pallas": _histogram_core_pallas_bwd,
}


def calculate_rgbuv_histogram(
    image_batch: jnp.ndarray,
    size: int = 64,
    method: str = "inverse-quadratic",
    sigma: float = 0.02,
    dtype=jnp.float32,
    fused_vjp: bool = True,
    bwd: str = "tri",
) -> jnp.ndarray:
    """Differentiable color histogram of a [-1, 1] NHWC batch.

    Returns (B, size, size, 3), normalized to sum 1 per element
    (histogram.py:35-81). `dtype` selects the compute precision of the
    (B, HW, size) kernel chain — float32 (default) for reference parity,
    bfloat16 for throughput (see _component_histogram). `fused_vjp` uses the
    hand-structured backward of `_histogram_core` (forward values are
    IDENTICAL — same code path; only the gradient structure differs);
    False falls back to plain autodiff, kept for parity tests. `bwd`
    selects the fused backward's dot structure: "tri" (one dot per chain),
    "dual" (shared DKV dot, see _histogram_core_dual), or "tri2"/"tri2b"
    (dkv = iy * m1 identity, 6 dots, see _histogram_core_tri2).
    """
    image_batch = image_batch * 0.5 + 0.5  # [-1,1] -> [0,1]
    image_batch = image_batch[..., :3]  # drop alpha
    b = image_batch.shape[0]
    flat = jnp.reshape(image_batch, (b, -1, 3))  # (B, HW, 3)

    if fused_vjp:
        if bwd not in _BWD_CORES:
            raise ValueError(
                f"unknown histogram_bwd {bwd!r}; "
                f"valid: {sorted(_BWD_CORES)}"
            )
        core = _BWD_CORES[bwd]
        histograms = core(flat, size, method, sigma, jnp.dtype(dtype))
    else:
        histograms = _unnormalized_histograms(flat, size, method, sigma, dtype)

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
