import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palette_and_histo_gan_tpu.ops import augment

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} missing; run scripts/make_golden.py")
    return np.load(path)


def test_rgb_hsv_matches_tf():
    g = _load("hsv")
    hsv = augment.rgb_to_hsv(jnp.asarray(g["rgb"]))
    np.testing.assert_allclose(hsv, g["hsv"], rtol=1e-4, atol=1e-3)


def test_hsv_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(1).random((32, 3)) * 255.0, jnp.float32)
    back = augment.hsv_to_rgb(augment.rgb_to_hsv(rgb))
    np.testing.assert_allclose(back, rgb, rtol=1e-4, atol=1e-2)


def test_adjust_hue_matches_tf():
    g = _load("hue")
    for i in range(g["images"].shape[0]):
        out = augment.adjust_hue(jnp.asarray(g["images"][i]), float(g["deltas"][i]))
        np.testing.assert_allclose(out, g["expected"][i], rtol=1e-3, atol=0.51)


def test_adjust_hue_zero_is_identity():
    img = jnp.asarray(np.random.default_rng(2).random((8, 8, 3)) * 255, jnp.float32)
    np.testing.assert_allclose(augment.adjust_hue(img, 0.0), img, rtol=1e-4, atol=1e-2)


def test_translate_matches_tf():
    g = _load("translate")
    for i in range(g["images"].shape[0]):
        dy, dx = g["offsets"][i]
        out = augment.translate_nearest(jnp.asarray(g["images"][i]), dy, dx)
        np.testing.assert_allclose(out, g["expected"][i], atol=1e-4)


def test_translate_integer_shift():
    img = jnp.zeros((4, 4, 1)).at[1, 1, 0].set(5.0)
    out = augment.translate_nearest(img, 1.0, 2.0)  # down 1, right 2
    assert float(out[2, 3, 0]) == 5.0
    assert float(jnp.sum(out)) == 5.0


def test_hue_rotation_pair_shares_delta():
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(4)
    src = jnp.asarray(rng.integers(0, 256, (8, 8, 4)), jnp.float32)
    # if target == source, the outputs must be identical (same delta)
    a, b = augment.hue_rotation_pair(src, src, key)
    np.testing.assert_allclose(a, b)
    # alpha preserved
    np.testing.assert_allclose(a[..., 3], src[..., 3])


def test_translation_pair_shares_offset():
    key = jax.random.PRNGKey(5)
    src = jnp.zeros((8, 8, 4)).at[4, 4].set(1.0)
    a, b = augment.translation_pair(src, src, key)
    np.testing.assert_allclose(a, b)


def test_augment_prob_zero_is_identity():
    key = jax.random.PRNGKey(6)
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.integers(0, 256, (8, 8, 4)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 256, (8, 8, 4)), jnp.float32)
    a, b = augment.augment_pair_with_prob(src, tgt, key, prob=0.0)
    np.testing.assert_allclose(a, src)
    np.testing.assert_allclose(b, tgt)


def test_augment_batch_shapes_and_jit():
    key = jax.random.PRNGKey(8)
    rng = np.random.default_rng(9)
    srcs = jnp.asarray(rng.integers(0, 256, (4, 16, 16, 4)), jnp.float32)
    tgts = jnp.asarray(rng.integers(0, 256, (4, 16, 16, 4)), jnp.float32)
    fn = jax.jit(augment.augment_batch)
    a, b = fn(srcs, tgts, key)
    assert a.shape == srcs.shape and b.shape == tgts.shape
    assert jnp.all(jnp.isfinite(a)) and jnp.all(jnp.isfinite(b))


def test_augment_batch_shift_matches_translate_nearest():
    """Integer shifts expressed either way (the production path uses one-hot
    shift matmuls, see augment_batch) must match the per-image gather
    implementation translate_nearest for the same offsets."""
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.integers(0, 256, (6, 16, 16, 4)), jnp.float32)
    offsets = rng.uniform(-2.4, 1.2, (6, 2)).astype(np.float32)
    margin = 12
    for i in range(6):
        dy, dx = float(offsets[i, 0]), float(offsets[i, 1])
        ref = augment.translate_nearest(imgs[i], dy, dx)
        padded = jnp.pad(imgs[i], ((margin, margin), (margin, margin), (0, 0)))
        fast = jax.lax.dynamic_slice(
            padded,
            (margin - int(np.round(dy)), margin - int(np.round(dx)), 0),
            (16, 16, 4),
        )
        np.testing.assert_allclose(fast, ref, atol=1e-5)


def test_augment_batch_end_to_end_matches_per_image_reference():
    """The production batched path (hue rotation -> one-hot-matmul shift ->
    probability select; the one actually run inside the train step) must
    equal, per image, the TF-golden-tested primitives adjust_hue +
    translate_nearest composed with the same draws. Replicates
    augment_batch's documented RNG contract (four batched draws:
    choice, delta, dy, dx) and checks both the augmented and the
    passed-through branches (dataset_utils.py:80-120 semantics)."""
    key = jax.random.PRNGKey(12)
    rng = np.random.default_rng(13)
    b, h, w = 8, 16, 16
    srcs = jnp.asarray(rng.integers(0, 256, (b, h, w, 4)), jnp.float32)
    tgts = jnp.asarray(rng.integers(0, 256, (b, h, w, 4)), jnp.float32)
    prob = 0.5  # exercise both branches

    out_s, out_t = jax.jit(augment.augment_batch, static_argnames="prob")(
        srcs, tgts, key, prob=prob
    )

    k_choice, k_hue, k_dy, k_dx = jax.random.split(key, 4)
    choice = np.asarray(jax.random.uniform(k_choice, (b,)))
    delta = np.asarray(
        jax.random.uniform(
            k_hue, (b,), minval=-augment.MAX_HUE_DELTA, maxval=augment.MAX_HUE_DELTA
        )
    )
    dy = np.asarray(
        jax.random.uniform(
            k_dy, (b,), minval=augment.HEIGHT_FACTOR[0], maxval=augment.HEIGHT_FACTOR[1]
        )
    ) * h
    dx = np.asarray(
        jax.random.uniform(
            k_dx, (b,), minval=augment.WIDTH_FACTOR[0], maxval=augment.WIDTH_FACTOR[1]
        )
    ) * w

    took_aug = 0
    for i in range(b):
        def reference(img):
            rgb = augment.adjust_hue(img[..., :3], delta[i])
            rotated = jnp.concatenate([rgb, img[..., 3:]], axis=-1)
            # pre-rounded offsets: the batched path shifts by whole pixels
            return augment.translate_nearest(
                rotated, float(np.round(dy[i])), float(np.round(dx[i]))
            )

        if choice[i] < prob:
            took_aug += 1
            # 4e-3 covers the TPU shift einsum's Precision.HIGH two-way bf16
            # split of the hue-rotated floats (~|x|*2^-17 on the 0-255
            # scale, ops/augment.py); CPU ignores precision flags and
            # matches to f32 roundoff
            np.testing.assert_allclose(out_s[i], reference(srcs[i]), atol=4e-3)
            np.testing.assert_allclose(out_t[i], reference(tgts[i]), atol=4e-3)
        else:
            np.testing.assert_allclose(out_s[i], srcs[i], atol=0)
            np.testing.assert_allclose(out_t[i], tgts[i], atol=0)
    assert 0 < took_aug < b  # both branches actually exercised


def test_augment_pallas_matches_xla_batch():
    """The fused Pallas augmentation kernel (ops/augment_pallas.py) computes
    the same augmentation as augment_batch for the same key — on CPU the
    kernel auto-selects interpreter mode (ops/augment_pallas.py::
    _call_kernel); TPU-compiled parity is covered by the device A/B in
    docs/DESIGN.md and the production default selection."""
    from palette_and_histo_gan_tpu.ops import augment_pallas as ap

    rng = np.random.default_rng(13)
    b = 8
    src = rng.integers(0, 256, (b, 64, 64, 4)).astype(np.uint8)
    tgt = rng.integers(0, 256, (b, 64, 64, 4)).astype(np.uint8)
    key = jax.random.PRNGKey(21)

    ref_s, ref_t = augment.augment_batch(
        jnp.asarray(src, jnp.float32), jnp.asarray(tgt, jnp.float32), key, 0.8
    )
    out_s, out_t = ap.augment_batch_pallas(
        jnp.asarray(src), jnp.asarray(tgt), key, 0.8
    )
    # b=8 exercises the 8-image-block program; b=4 the block-1 path
    out_s4, _ = ap.augment_batch_pallas(
        jnp.asarray(src[:4]), jnp.asarray(tgt[:4]), key, 0.8
    )
    norm_s, norm_t = ap.augment_batch_pallas(
        jnp.asarray(src), jnp.asarray(tgt), key, 0.8, normalize_out=True
    )
    # identical f32 math modulo op-ordering rounding in the hue chain
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t), atol=5e-4)
    # the fused normalize is exactly normalize(out) ([0,255] -> [-1,1])
    np.testing.assert_allclose(
        np.asarray(norm_s), np.asarray(out_s) / 127.5 - 1.0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(norm_t), np.asarray(out_t) / 127.5 - 1.0, atol=1e-6
    )
    # block-1 path agrees with the blocked path on the shared prefix?
    # (different batch -> different RNG draws; just check shape/finite)
    assert out_s4.shape == (4, 64, 64, 4)
    assert np.isfinite(np.asarray(out_s4)).all()


def test_augment_pallas_packed_matches_unpacked():
    """The packed-input kernel (u32 pixels straight off the train chunk's
    4-byte-lane gather) computes bit-identically to augment_batch_pallas on
    the unpacked uint8 batch — same draws, planar hue/shift/select chain +
    one-hot MXU interleave vs the lane-interleaved chain."""
    from palette_and_histo_gan_tpu.ops import augment_pallas as ap

    rng = np.random.default_rng(31)
    b = 8
    src = rng.integers(0, 256, (b, 64, 64, 4)).astype(np.uint8)
    tgt = rng.integers(0, 256, (b, 64, 64, 4)).astype(np.uint8)
    key = jax.random.PRNGKey(11)
    packed_s = jax.lax.bitcast_convert_type(
        jnp.asarray(src).reshape(b, -1, 4), jnp.uint32
    )
    packed_t = jax.lax.bitcast_convert_type(
        jnp.asarray(tgt).reshape(b, -1, 4), jnp.uint32
    )

    for normalize_out, out_dtype in [
        (False, jnp.float32), (True, jnp.float32), (True, jnp.bfloat16),
    ]:
        ref_s, ref_t = ap.augment_batch_pallas(
            jnp.asarray(src), jnp.asarray(tgt), key, 0.8,
            normalize_out=normalize_out, out_dtype=out_dtype,
        )
        out_s, out_t = ap.augment_batch_pallas_packed(
            packed_s, packed_t, key, 0.8,
            normalize_out=normalize_out, out_dtype=out_dtype,
        )
        assert out_s.dtype == jnp.dtype(out_dtype)
        np.testing.assert_array_equal(np.asarray(out_s), np.asarray(ref_s))
        np.testing.assert_array_equal(np.asarray(out_t), np.asarray(ref_t))


def test_augment_pallas_bf16_out_is_rounded_f32():
    """out_dtype=bfloat16 is exactly the f32 kernel result rounded once at
    the write — bitwise what a downstream convert_element_type of the f32
    output would produce (the bf16 train step's contract; the kernel halves
    its write traffic by rounding in VMEM instead)."""
    from palette_and_histo_gan_tpu.ops import augment_pallas as ap

    rng = np.random.default_rng(29)
    b = 8
    src = rng.integers(0, 256, (b, 64, 64, 4)).astype(np.uint8)
    tgt = rng.integers(0, 256, (b, 64, 64, 4)).astype(np.uint8)
    key = jax.random.PRNGKey(5)

    f32_s, f32_t = ap.augment_batch_pallas(
        jnp.asarray(src), jnp.asarray(tgt), key, 0.8, normalize_out=True
    )
    bf_s, bf_t = ap.augment_batch_pallas(
        jnp.asarray(src), jnp.asarray(tgt), key, 0.8, normalize_out=True,
        out_dtype=jnp.bfloat16,
    )
    assert bf_s.dtype == jnp.bfloat16 and bf_t.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(bf_s), np.asarray(f32_s.astype(jnp.bfloat16))
    )
    np.testing.assert_array_equal(
        np.asarray(bf_t), np.asarray(f32_t.astype(jnp.bfloat16))
    )
