"""Device-side paired data augmentation.

TPU-native equivalents of the reference's tf.data augmentation maps
(/root/reference/dataset_utils.py:80-120):

  - paired hue rotation (tf.image.stateless_random_hue(img, 0.5, seed) with a
    *shared* seed for source and target, applied to RGB only, alpha preserved)
  - paired random translation (keras RandomTranslation((-0.15, 0.075), 0.125,
    fill_mode="constant", interpolation="nearest") over the channel-concatenated
    pair, so both images shift identically)
  - the whole pair is augmented with probability 0.8

Unlike the reference, which runs these on host CPU inside tf.data, these are
pure `jax.random`-keyed functions designed to run *inside* the jitted train
step on batched tensors, so augmentation fuses with the rest of the step and
never touches the host. They operate on unnormalized [0, 255] float32 images,
mirroring the reference pipeline order (augment before normalize,
dataset_utils.py:213-222).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# keras RandomTranslation factors (dataset_utils.py:89)
HEIGHT_FACTOR = (-0.15, 0.075)
WIDTH_FACTOR = (-0.125, 0.125)
MAX_HUE_DELTA = 0.5  # dataset_utils.py:82


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB -> HSV, scale-covariant like tf.image.rgb_to_hsv.

    Works on any non-negative value range (the reference applies hue rotation
    to [0, 255] floats); H and S are scale-invariant, V carries the scale.
    """
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    rng = v - mn
    safe_rng = jnp.where(rng == 0, 1.0, rng)
    safe_v = jnp.where(v == 0, 1.0, v)

    s = jnp.where(v == 0, 0.0, rng / safe_v)

    hr = ((g - b) / safe_rng) % 6.0
    hg = (b - r) / safe_rng + 2.0
    hb = (r - g) / safe_rng + 4.0
    h = jnp.where(v == r, hr, jnp.where(v == g, hg, hb))
    h = jnp.where(rng == 0, 0.0, h / 6.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """HSV -> RGB, inverse of rgb_to_hsv (same convention as TF)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    dh = (h % 1.0) * 6.0
    dr = jnp.clip(jnp.abs(dh - 3.0) - 1.0, 0.0, 1.0)
    dg = jnp.clip(2.0 - jnp.abs(dh - 2.0), 0.0, 1.0)
    db = jnp.clip(2.0 - jnp.abs(dh - 4.0), 0.0, 1.0)
    one_minus_s = 1.0 - s
    r = v * (one_minus_s + s * dr)
    g = v * (one_minus_s + s * dg)
    b = v * (one_minus_s + s * db)
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(image_rgb: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Rotate hue by `delta` (fraction of a full turn), like tf.image.adjust_hue."""
    hsv = rgb_to_hsv(image_rgb)
    h = (hsv[..., 0] + delta) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def hue_rotation_pair(
    source: jnp.ndarray, target: jnp.ndarray, key: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the *same* random hue rotation to both images' RGB channels.

    Matches augment_hue_rotation at dataset_utils.py:80-84 called twice with a
    shared seed (dataset_utils.py:96-99). Alpha channels pass through.
    """
    delta = jax.random.uniform(key, (), minval=-MAX_HUE_DELTA, maxval=MAX_HUE_DELTA)

    def rotate(img):
        rgb = adjust_hue(img[..., :3], delta)
        return jnp.concatenate([rgb, img[..., 3:]], axis=-1)

    return rotate(source), rotate(target)


def translate_nearest(image: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Translate an HWC image by (dy, dx) pixels, nearest interp, zero fill.

    Reproduces keras RandomTranslation semantics (positive dy shifts the image
    down): output(y, x) = input(round(y - dy), round(x - dx)), zero outside.
    """
    h, w = image.shape[0], image.shape[1]
    ys = jnp.arange(h, dtype=jnp.float32) - dy
    xs = jnp.arange(w, dtype=jnp.float32) - dx
    iy = jnp.round(ys).astype(jnp.int32)
    ix = jnp.round(xs).astype(jnp.int32)
    valid_y = (iy >= 0) & (iy < h)
    valid_x = (ix >= 0) & (ix < w)
    gathered = image[jnp.clip(iy, 0, h - 1)][:, jnp.clip(ix, 0, w - 1)]
    mask = (valid_y[:, None] & valid_x[None, :])[..., None]
    return jnp.where(mask, gathered, 0.0)


def translation_pair(
    source: jnp.ndarray, target: jnp.ndarray, key: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shift both images by the same random offset (dataset_utils.py:87-92).

    The reference concatenates the pair on channels so one RandomTranslation
    layer moves both; sharing (dy, dx) here is equivalent.
    """
    h, w = source.shape[0], source.shape[1]
    ky, kx = jax.random.split(key)
    dy = jax.random.uniform(ky, (), minval=HEIGHT_FACTOR[0], maxval=HEIGHT_FACTOR[1]) * h
    dx = jax.random.uniform(kx, (), minval=WIDTH_FACTOR[0], maxval=WIDTH_FACTOR[1]) * w
    return translate_nearest(source, dy, dx), translate_nearest(target, dy, dx)


def augment_pair(
    source: jnp.ndarray, target: jnp.ndarray, key: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hue rotation then translation, both paired (dataset_utils.py:95-102)."""
    k_hue, k_tr = jax.random.split(key)
    source, target = hue_rotation_pair(source, target, k_hue)
    return translation_pair(source, target, k_tr)


def augment_pair_with_prob(
    source: jnp.ndarray,
    target: jnp.ndarray,
    key: jax.Array,
    prob: float = 0.8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Augment the pair with probability `prob` (dataset_utils.py:109-120).

    Computes the augmented branch unconditionally and selects — at 64x64 the
    arithmetic is trivially cheap and `where` keeps the jitted graph free of
    control flow.
    """
    k_choice, k_aug = jax.random.split(key)
    choice = jax.random.uniform(k_choice, ())
    aug_src, aug_tgt = augment_pair(source, target, k_aug)
    take_aug = choice < prob
    return (
        jnp.where(take_aug, aug_src, source),
        jnp.where(take_aug, aug_tgt, target),
    )


def augment_batch(
    sources: jnp.ndarray,
    targets: jnp.ndarray,
    key: jax.Array,
    prob: float = 0.8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pair augmentation over a batch.

    All randomness is drawn in four batched calls up front (thousands of
    tiny per-image PRNG invocations inside a vmap are latency-bound on TPU);
    the deterministic transform is then vmapped over per-image scalars.
    Distributions are identical to augment_pair_with_prob.
    """
    b, h, w = sources.shape[0], sources.shape[1], sources.shape[2]
    k_choice, k_hue, k_dy, k_dx = jax.random.split(key, 4)
    choice = jax.random.uniform(k_choice, (b,))
    delta = jax.random.uniform(k_hue, (b,), minval=-MAX_HUE_DELTA, maxval=MAX_HUE_DELTA)
    dy = jax.random.uniform(k_dy, (b,), minval=HEIGHT_FACTOR[0], maxval=HEIGHT_FACTOR[1]) * h
    dx = jax.random.uniform(k_dx, (b,), minval=WIDTH_FACTOR[0], maxval=WIDTH_FACTOR[1]) * w

    # nearest-neighbor translation of an integer grid is an integer shift:
    # round(y - dy) == y - round(dy) away from exact .5 ties (probability
    # zero under the uniform offsets). The shift is applied as two tiny
    # one-hot matmuls (P @ img @ Q^T with single-nonzero rows) — exact, and
    # the MXU-friendly formulation is ~10x faster than per-image gathers
    sy = jnp.round(dy).astype(jnp.int32)  # out row y reads in row y - sy
    sx = jnp.round(dx).astype(jnp.int32)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
    iota_hj = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    iota_wk = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    # (B, H, H): P[b, y, j] = 1 iff j == y - sy_b (zero rows outside = fill 0)
    p_mats = (iota_hj[None] == (iota_h[None] - sy[:, None, None])).astype(jnp.float32)
    q_mats = (iota_wk[None] == (iota_w[None] - sx[:, None, None])).astype(jnp.float32)

    def one(src, tgt, take, de, p_mat, q_mat):
        def rotate(img):
            rgb = adjust_hue(img[..., :3], de)
            return jnp.concatenate([rgb, img[..., 3:]], axis=-1)

        def shift(img):
            # out[y, x, c] = sum_{j,k} P[y, j] img[j, k, c] Q[x, k]
            # HIGH (bf16x3): P/Q are 0/1 so their bf16 low halves are zero
            # and the kept cross terms reconstruct P @ (img_hi + img_lo) —
            # a TWO-way bf16 split of img (~16-17 significand bits). Exact
            # for integer-valued img, but the shift runs on hue-rotated
            # non-integer floats, so TPU outputs can deviate up to ~|x|*2^-17
            # (~2e-3 on the 0-255 scale) from the f32 path. Accepted: half
            # of HIGHEST's MXU passes for noise far below quantization;
            # tests/test_augment.py's end-to-end tolerance (4e-3) covers it.
            return jnp.einsum(
                "yj,jkc,xk->yxc", p_mat, img, q_mat,
                precision=jax.lax.Precision.HIGH,
            )

        aug_s = shift(rotate(src))
        aug_t = shift(rotate(tgt))
        keep = take < prob
        return (
            jnp.where(keep, aug_s, src),
            jnp.where(keep, aug_t, tgt),
        )

    return jax.vmap(one)(sources, targets, choice, delta, p_mats, q_mats)
