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
import math

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
            # the whole chain computes in f32; a narrower out dtype is one
            # round-to-nearest at the write — bitwise the same values the
            # consumer's convert_element_type would produce from the f32
            # output, at half the HBM write traffic
            out_ref[j] = out.astype(out_ref.dtype)


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


def _call_kernel(
    delta, sy, sx, keep, flat_s, flat_t, *, normalize_out,
    out_dtype=jnp.float32,
):
    """The pallas_call itself over (b, H, LANES) inputs. Per-image, so it
    computes identical values whether it sees the full batch or a shard."""
    b = flat_s.shape[0]
    block = 8 if b % 8 == 0 else 1
    out_shape = jax.ShapeDtypeStruct((b, H, LANES), jnp.dtype(out_dtype))
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
    out_dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused equivalent of ops.augment.augment_batch.

    Accepts uint8 or float32 (B, 64, 64, 4) batches (uint8 straight from the
    HBM-resident dataset gather — the upcast happens in VMEM) and returns
    `out_dtype` (float32 default). Identical randomness schedule to
    augment_batch: same key, same augmentation. With `normalize_out` the
    [0,255] -> [-1,1] normalize is folded into the kernel's write (exact
    same formula as ops.image). A bfloat16 `out_dtype` rounds the f32 chain
    once at the write — bitwise what a downstream convert of the f32 output
    would produce (pinned in tests/test_augment.py), at half the write
    traffic; used by the train step in bf16 compute mode, where every
    consumer casts to bf16 anyway.
    """
    b, h, w, c = sources.shape
    assert (h, w * c) == (H, LANES), (sources.shape, "kernel is 64x64x4-specific")
    delta, sy, sx, keep = _draw_params(key, b, prob)
    out_s, out_t = _call_kernel(
        delta, sy, sx, keep,
        sources.reshape(b, H, LANES), targets.reshape(b, H, LANES),
        normalize_out=normalize_out, out_dtype=out_dtype,
    )
    return out_s.reshape(b, h, w, c), out_t.reshape(b, h, w, c)


W = 64


def _hue_rotate_planar(r, g, b, delta):
    """The hue chain of _hue_rotate_lanes on planar (64, 64) channel tiles.

    Same algebra (one reciprocal, saturation never formed, [0,6) sextant
    domain) but computed once per pixel on quarter-size tiles instead of
    redundantly on all 256 interleaved lanes — the per-pixel ops run on
    half the vector registers (64 lanes padded to 128 vs 256)."""
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
    return mn + rng * dr, mn + rng * dg, mn + rng * db


def _augment_kernel_packed(
    delta_ref, sy_ref, sx_ref, keep_ref, src_ref, tgt_ref, out_s_ref, out_t_ref,
    *, block, normalize_out
):
    """Packed-input variant: consumes the train chunk's 4-byte-lane gather
    output DIRECTLY as u32 (B, 64, 64) pixels — the XLA-side u32 -> u8
    unpack pass (an HBM round trip plus two materialized broadcast-shift
    relayout copies, ~0.55 ms/step at batch 1024; docs/DESIGN.md) never
    exists. Channels are unpacked in VMEM with shifts (little-endian RGBA:
    byte 0 = R, matching lax.bitcast_convert_type on both the TPU and the
    test hosts), the hue/shift/select chain runs planar, and the
    (64, 4*64) channel-interleaved output is assembled by one one-hot
    matmul on the MXU — exact, one term per output element."""
    i = pl.program_id(0)

    # interleave matrix P[64*c + k, 4*k + c] = 1: [R|G|B|A] planar concat
    # (64, 256) @ P -> interleaved (64, 256). One term per output element,
    # so the dot is an exact permutation-select on the MXU. Constant across
    # images; hoisted out of the unrolled loop by CSE.
    prow = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    pcol = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    interleave = ((pcol % CH) * W + pcol // CH == prow).astype(jnp.float32)

    for j in range(block):
        idx = i * block + j
        delta = delta_ref[idx]
        keep = keep_ref[idx]
        # translation after the planar keep-select, on the ALIGNED (64, 256)
        # interleaved tile (Mosaic rejects lane rotates of 64-wide planar
        # tiles): zeroing the shift for kept-original images makes the roll
        # an exact identity, so the select can run before the shift
        sy = sy_ref[idx] * keep
        sx = sx_ref[idx] * keep

        for in_ref, out_ref in ((src_ref, out_s_ref), (tgt_ref, out_t_ref)):
            # Mosaic has no u32 -> f32 cast: bitcast to i32 (same width,
            # values are re-masked to [0, 255] below) and shift LOGICALLY
            # (i32 >> is arithmetic; byte 3 would smear the sign)
            v32 = pltpu.bitcast(in_ref[j], jnp.int32)
            planar = []
            for c in range(CH):
                ch = jax.lax.shift_right_logical(v32, 8 * c) & 0xFF
                planar.append(ch.astype(jnp.float32))
            r, g, b, a = planar
            hr_, hg_, hb_ = _hue_rotate_planar(r, g, b, delta)
            sel = [
                jnp.where(keep != 0, aug_c, orig_c)
                for aug_c, orig_c in zip((hr_, hg_, hb_), (r, g, b))
            ] + [a]
            out = jax.lax.dot(
                jnp.concatenate(sel, axis=1),
                interleave,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            out = _shift_lanes(out, sy, sx)
            if normalize_out:
                out = out / 127.5 - 1.0
            out_ref[j] = out.astype(out_ref.dtype)


def _call_kernel_packed(
    delta, sy, sx, keep, packed_s, packed_t, *, normalize_out,
    out_dtype=jnp.float32,
):
    """pallas_call over packed u32 (b, 64, 64) pixel inputs."""
    b = packed_s.shape[0]
    block = 8 if b % 8 == 0 else 1
    out_shape = jax.ShapeDtypeStruct((b, H, LANES), jnp.dtype(out_dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec((block, H, W), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((block, H, W), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, H, LANES), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((block, H, LANES), lambda i, *_: (i, 0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _augment_kernel_packed, block=block, normalize_out=normalize_out
        ),
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape),
        interpret=jax.default_backend() == "cpu",
    )(delta, sy, sx, keep, packed_s, packed_t)


def augment_batch_pallas_packed(
    packed_sources: jnp.ndarray,
    packed_targets: jnp.ndarray,
    key: jax.Array,
    prob: float = 0.8,
    normalize_out: bool = False,
    out_dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """augment_batch_pallas on uint32-packed pixels, straight off the train
    chunk's 4-byte-lane gather (train/steps.py::_pack_rows_u32): each u32 is
    one little-endian RGBA pixel. Returns (B, 64, 64, 4) `out_dtype`,
    bit-identical to augment_batch_pallas on the unpacked uint8 batch
    (pinned in tests/test_augment.py)."""
    b = packed_sources.shape[0]
    assert packed_sources.dtype == jnp.uint32, packed_sources.dtype
    assert math.prod(packed_sources.shape[1:]) == H * W, (
        packed_sources.shape, "expected 4096 packed pixels per image",
    )
    delta, sy, sx, keep = _draw_params(key, b, prob)
    out_s, out_t = _call_kernel_packed(
        delta, sy, sx, keep,
        packed_sources.reshape(b, H, W), packed_targets.reshape(b, H, W),
        normalize_out=normalize_out, out_dtype=out_dtype,
    )
    return out_s.reshape(b, H, W, CH), out_t.reshape(b, H, W, CH)


def augment_batch_pallas_sharded(
    sources: jnp.ndarray,
    targets: jnp.ndarray,
    key: jax.Array,
    prob: float = 0.8,
    normalize_out: bool = False,
    out_dtype=jnp.float32,
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

    Accepts either unpacked (B, 64, 64, 4) uint8/float batches or the train
    chunk's uint32-packed (B, 4096) pixel arrays (dispatching on dtype, like
    the unsharded pair augment_batch_pallas / augment_batch_pallas_packed).
    """
    from jax.sharding import PartitionSpec as P

    b = sources.shape[0]
    packed = sources.dtype == jnp.uint32
    if packed:
        call, flat_shape = _call_kernel_packed, (b, H, W)
    else:
        h, w, c = sources.shape[1:]
        assert (h, w * c) == (H, LANES), (
            sources.shape, "kernel is 64x64x4-specific",
        )
        call, flat_shape = _call_kernel, (b, H, LANES)
    delta, sy, sx, keep = _draw_params(key, b, prob)
    spec = P(axis)
    fn = jax.shard_map(
        functools.partial(call, normalize_out=normalize_out, out_dtype=out_dtype),
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
        sources.reshape(flat_shape), targets.reshape(flat_shape),
    )
    return out_s.reshape(b, H, W, CH), out_t.reshape(b, H, W, CH)
