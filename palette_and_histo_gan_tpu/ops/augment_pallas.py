"""Fused Pallas TPU kernel for paired hue-rotation + translation augmentation.

One HBM pass for the whole augmentation (reference semantics:
/root/reference/dataset_utils.py:80-120, reproduced by ops/augment.py):
each grid program loads one (source, target) image pair into VMEM, applies
the shared hue rotation, the shared integer translation, and the
keep-with-prob select entirely on the VPU, and writes the float32 results.

Why: in the XLA path the batched one-hot shift matmuls lower to
batch-in-lanes input-dilated convolutions at ~20x their FLOP cost, and the
hue chain / select materialize additional full-batch tensors — ~5.8 ms of a
38.8 ms baseline step at batch 1024 (docs/DESIGN.md round-3 trace). The
fused kernel's traffic is one read of each uint8 input (16.8 MB) plus one
write of each f32 output (67 MB) — a ~0.2 ms floor at v5e HBM bandwidth.

Layout: images are viewed as (B, H, W*C) so a program block is (1, 64, 256)
— full 8x128 f32 tiles with lane index 4x + c. Channel access for the hue
math uses lane rolls (g and b aligned onto r's lanes); the hue result is
computed redundantly on all 256 lanes and reassembled with lane-index
selects. The translation is a circular `pltpu.roll` over rows (sublanes)
and lanes (by 4*sx, preserving channel alignment) with the wrapped region
masked to the constant fill 0 — exactly translate_nearest's clamp+mask
semantics (ops/augment.py:93-108).

Randomness is drawn OUTSIDE the kernel with the same key schedule as
ops.augment.augment_batch, so for one PRNG key the two implementations
compute the same augmentation (parity-tested in tests/test_augment.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .augment import HEIGHT_FACTOR, MAX_HUE_DELTA, WIDTH_FACTOR

H = 64
LANES = 256  # W * C = 64 * 4
CH = 4


def _hue_rotate_lanes(v: jnp.ndarray, delta) -> jnp.ndarray:
    """Hue-rotate a (64, 256) lane-interleaved RGBA image by `delta` turns.

    Implements exactly ops/augment.py::adjust_hue (the TF rgb<->hsv
    convention) with channels accessed by lane rolls: after aligning g and b
    onto r's lanes the full HSV round-trip runs on every lane (only lanes
    = 0 mod 4 hold meaningful triples) and the three rotated channels are
    reassembled by lane-index selects. Alpha lanes pass through.
    """
    g_al = pltpu.roll(v, shift=LANES - 1, axis=1)  # lane 4k now holds g
    b_al = pltpu.roll(v, shift=LANES - 2, axis=1)  # lane 4k now holds b

    # Algebraically restructured from ops/augment.py's rgb_to_hsv/hsv_to_rgb
    # for the VPU — the divides are the expensive ops here:
    #   - one reciprocal replaces the three /safe_rng divides;
    #   - saturation is never formed: v*(1-s) + v*s*d == mn + rng*d exactly
    #     (v*s == rng), dropping the s divide and its zero guard;
    #   - hue stays in the [0, 6) sextant domain: (h/6 + delta) % 1 * 6
    #     == (h + 6*delta) % 6, dropping a divide, a redundant % 1.0, and
    #     the *6 rescale.
    # Each change is <= a few ULP at the 255 scale vs the XLA chain
    # (parity-pinned at 5e-4 in tests/test_augment.py).
    r, g, b = v, g_al, b_al
    vmax = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    rng = vmax - mn
    inv_rng = 1.0 / jnp.where(rng == 0, 1.0, rng)

    hr = ((g - b) * inv_rng) % 6.0
    hg = (b - r) * inv_rng + 2.0
    hb = (r - g) * inv_rng + 4.0
    h = jnp.where(vmax == r, hr, jnp.where(vmax == g, hg, hb))
    h = jnp.where(rng == 0, 0.0, h)

    dh = (h + 6.0 * delta) % 6.0
    dr = jnp.clip(jnp.abs(dh - 3.0) - 1.0, 0.0, 1.0)
    dg = jnp.clip(2.0 - jnp.abs(dh - 2.0), 0.0, 1.0)
    db = jnp.clip(2.0 - jnp.abs(dh - 4.0), 0.0, 1.0)
    nr = mn + rng * dr
    ng = mn + rng * dg
    nb = mn + rng * db

    lane_mod = jax.lax.broadcasted_iota(jnp.int32, (H, LANES), 1) % CH
    return jnp.where(
        lane_mod == 0,
        nr,
        jnp.where(
            lane_mod == 1,
            pltpu.roll(ng, shift=1, axis=1),
            jnp.where(lane_mod == 2, pltpu.roll(nb, shift=2, axis=1), v),
        ),
    )


def _shift_lanes(x: jnp.ndarray, sy, sx) -> jnp.ndarray:
    """out[y, 4x+c] = x[y-sy, 4(x-sx)+c], zero fill: circular rolls with the
    wrapped region masked (translate_nearest semantics)."""
    # pltpu.roll requires non-negative shifts; modular shift is the
    # same circular permutation
    rolled = pltpu.roll(x, shift=sy % H, axis=0)
    rolled = pltpu.roll(rolled, shift=(CH * sx) % LANES, axis=1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, LANES), 1) // CH
    ok = (
        (row - sy >= 0)
        & (row - sy < H)
        & (col - sx >= 0)
        & (col - sx < H)
    )
    return jnp.where(ok, rolled, 0.0)


def _augment_kernel(
    delta_ref, sy_ref, sx_ref, keep_ref, src_ref, tgt_ref, out_s_ref, out_t_ref,
    *, block, normalize_out
):
    i = pl.program_id(0)
    # `block` images per program amortize the per-program DMA fixed costs
    # (1024 single-image programs measured 1.14 ms; the compute itself is
    # ~0.2 ms of traffic). The per-image loop is unrolled at trace time.
    for j in range(block):
        idx = i * block + j
        delta = delta_ref[idx]
        sy = sy_ref[idx]
        sx = sx_ref[idx]
        keep = keep_ref[idx]

        for in_ref, out_ref in ((src_ref, out_s_ref), (tgt_ref, out_t_ref)):
            v = in_ref[j]
            if v.dtype == jnp.uint8:
                # Mosaic has no direct u8 -> f32 cast; widen through int32
                v = v.astype(jnp.int32)
            v = v.astype(jnp.float32)
            aug = _shift_lanes(_hue_rotate_lanes(v, delta), sy, sx)
            out = jnp.where(keep != 0, aug, v)
            if normalize_out:
                # fold ops.image.normalize ([0,255] -> [-1,1]) into the
                # write: same formula, saves a full-batch elementwise pass
                out = out / 127.5 - 1.0
            out_ref[j] = out


def _draw_params(key: jax.Array, b: int, prob: float):
    """Per-image augmentation draws — the exact key schedule of
    ops.augment.augment_batch, so both implementations compute the same
    augmentation for the same key. Kept separate from the kernel call so the
    sharded variant can draw globally and shard the vectors."""
    k_choice, k_hue, k_dy, k_dx = jax.random.split(key, 4)
    choice = jax.random.uniform(k_choice, (b,))
    delta = jax.random.uniform(
        k_hue, (b,), minval=-MAX_HUE_DELTA, maxval=MAX_HUE_DELTA
    )
    dy = jax.random.uniform(
        k_dy, (b,), minval=HEIGHT_FACTOR[0], maxval=HEIGHT_FACTOR[1]
    ) * H
    dx = jax.random.uniform(
        k_dx, (b,), minval=WIDTH_FACTOR[0], maxval=WIDTH_FACTOR[1]
    ) * (LANES // CH)
    sy = jnp.round(dy).astype(jnp.int32)
    sx = jnp.round(dx).astype(jnp.int32)
    keep = (choice < prob).astype(jnp.int32)
    return delta, sy, sx, keep


def _call_kernel(delta, sy, sx, keep, flat_s, flat_t, *, normalize_out):
    """The pallas_call itself over (b, H, LANES) inputs. Per-image, so it
    computes identical values whether it sees the full batch or a shard."""
    b = flat_s.shape[0]
    block = 8 if b % 8 == 0 else 1
    out_shape = jax.ShapeDtypeStruct((b, H, LANES), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec((block, H, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((block, H, LANES), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, H, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((block, H, LANES), lambda i, *_: (i, 0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _augment_kernel, block=block, normalize_out=normalize_out
        ),
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape),
        # Mosaic compiles only on TPU. On the CPU backend (tests, the
        # virtual 8-device mesh) run the Pallas interpreter, which executes
        # identical semantics — including inside shard_map, where
        # pltpu.force_tpu_interpret_mode's TPU-core emulation stalls.
        interpret=jax.default_backend() == "cpu",
    )(delta, sy, sx, keep, flat_s, flat_t)


# NOT jitted here: the caller (train step) is always jitted, and a nested
# jit's closed_call inside the scanned step trips a cached-lowering KeyError
# in this JAX version
def augment_batch_pallas(
    sources: jnp.ndarray,
    targets: jnp.ndarray,
    key: jax.Array,
    prob: float = 0.8,
    normalize_out: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused equivalent of ops.augment.augment_batch.

    Accepts uint8 or float32 (B, 64, 64, 4) batches (uint8 straight from the
    HBM-resident dataset gather — the upcast happens in VMEM) and returns
    float32. Identical randomness schedule to augment_batch: same key, same
    augmentation. With `normalize_out` the [0,255] -> [-1,1] normalize is
    folded into the kernel's write (exact same formula as ops.image).
    """
    b, h, w, c = sources.shape
    assert (h, w * c) == (H, LANES), (sources.shape, "kernel is 64x64x4-specific")
    delta, sy, sx, keep = _draw_params(key, b, prob)
    out_s, out_t = _call_kernel(
        delta, sy, sx, keep,
        sources.reshape(b, H, LANES), targets.reshape(b, H, LANES),
        normalize_out=normalize_out,
    )
    return out_s.reshape(b, h, w, c), out_t.reshape(b, h, w, c)


def augment_batch_pallas_sharded(
    sources: jnp.ndarray,
    targets: jnp.ndarray,
    key: jax.Array,
    prob: float = 0.8,
    normalize_out: bool = False,
    *,
    mesh,
    axis: str = "data",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """augment_batch_pallas under a GSPMD mesh: a pallas_call is not
    automatically partitioned, so the kernel runs inside shard_map over the
    batch axis — each device augments its local shard with its slice of the
    globally-drawn parameter vectors. Bit-identical to the unsharded call:
    the draws are computed once outside (counter-mode PRNG, same key
    schedule) and the kernel is per-image.
    """
    from jax.sharding import PartitionSpec as P

    b, h, w, c = sources.shape
    assert (h, w * c) == (H, LANES), (sources.shape, "kernel is 64x64x4-specific")
    delta, sy, sx, keep = _draw_params(key, b, prob)
    spec = P(axis)
    fn = jax.shard_map(
        functools.partial(_call_kernel, normalize_out=normalize_out),
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=(spec, spec),
        # pallas_call's out ShapeDtypeStruct carries no varying-mesh-axes
        # info, which the vma checker requires; every operand here is
        # uniformly batch-sharded so the check adds nothing
        check_vma=False,
    )
    out_s, out_t = fn(
        delta, sy, sx, keep,
        sources.reshape(b, H, LANES), targets.reshape(b, H, LANES),
    )
    return out_s.reshape(b, h, w, c), out_t.reshape(b, h, w, c)
