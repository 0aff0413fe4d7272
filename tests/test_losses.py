import os

import jax.numpy as jnp
import numpy as np
import pytest

from palette_and_histo_gan_tpu.train import losses

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} missing; run scripts/make_golden.py")
    return np.load(path)


def test_bce_matches_keras():
    g = _load("losses")
    logits = jnp.asarray(g["logits"])
    ours_ones = losses.bce_with_logits(jnp.ones_like(logits), logits)
    ours_zeros = losses.bce_with_logits(jnp.zeros_like(logits), logits)
    np.testing.assert_allclose(ours_ones, g["bce_ones"], rtol=1e-5)
    np.testing.assert_allclose(ours_zeros, g["bce_zeros"], rtol=1e-5)


def test_cce_matches_keras():
    g = _load("losses")
    ours = losses.categorical_crossentropy_probs(
        jnp.asarray(g["onehot"]), jnp.asarray(g["probs"])
    )
    np.testing.assert_allclose(ours, g["cce"], rtol=1e-5)


def test_generator_loss_structure():
    fake_pred = jnp.zeros((2, 32, 32, 1))
    fake = jnp.zeros((2, 64, 64, 4))
    real = jnp.ones((2, 64, 64, 4)) * 0.5
    m = losses.generator_loss(fake_pred, fake, real, lambda_l1=100.0)
    # BCE(1, 0-logits) = ln 2; L1 = 0.5
    np.testing.assert_allclose(m["adversarial_loss"], np.log(2.0), rtol=1e-5)
    np.testing.assert_allclose(m["l1_loss"], 0.5, rtol=1e-6)
    np.testing.assert_allclose(
        m["total_loss"], np.log(2.0) + 100.0 * 0.5, rtol=1e-5
    )


def test_discriminator_loss_structure():
    real_pred = jnp.full((1, 32, 32, 1), 3.0)
    fake_pred = jnp.full((1, 32, 32, 1), -3.0)
    m = losses.discriminator_loss(real_pred, fake_pred)
    # confident correct discriminator -> small loss
    assert float(m["total_loss"]) < 0.2
    np.testing.assert_allclose(
        m["total_loss"], m["real_loss"] + m["fake_loss"], rtol=1e-6
    )


def test_sparse_cce_matches_dense():
    rng = np.random.default_rng(6)
    probs = jnp.asarray(rng.random((2, 4, 4, 16)), jnp.float32)
    probs = probs / jnp.sum(probs, -1, keepdims=True)
    labels = jnp.asarray(rng.integers(0, 16, (2, 4, 4)), jnp.int32)
    import jax

    onehot = jax.nn.one_hot(labels, 16, dtype=jnp.float32)
    dense = losses.categorical_crossentropy_probs(onehot, probs)
    sparse = losses.sparse_categorical_crossentropy_probs(labels, probs)
    np.testing.assert_allclose(sparse, dense, rtol=1e-6)
    # gradients must agree too (the training path uses the sparse form)
    g_dense = jax.grad(lambda p: losses.categorical_crossentropy_probs(onehot, p))(probs)
    g_sparse = jax.grad(lambda p: losses.sparse_categorical_crossentropy_probs(labels, p))(probs)
    np.testing.assert_allclose(g_sparse, g_dense, rtol=1e-4, atol=1e-7)


def test_onehot_l1_matches_dense():
    rng = np.random.default_rng(7)
    probs = jnp.asarray(rng.random((2, 4, 4, 16)), jnp.float32)
    probs = probs / jnp.sum(probs, -1, keepdims=True)
    labels = jnp.asarray(rng.integers(0, 16, (2, 4, 4)), jnp.int32)
    import jax

    onehot = jax.nn.one_hot(labels, 16, dtype=jnp.float32)
    dense = jnp.mean(jnp.abs(onehot - probs))
    sparse = losses.onehot_l1_probs(labels, probs)
    np.testing.assert_allclose(sparse, dense, rtol=1e-5)


def test_out_of_range_labels_match_tf_one_hot_semantics():
    """The rgba_to_indexed scatter-sum quirk can emit labels > 255
    (ops/palette.py; reference tf.scatter_nd index-sum). The reference takes
    tf.one_hot(label, 256) whose out-of-range rows are ALL-ZERO
    (pix2pix_model.py:300): keras CCE contributes 0 there, |onehot - probs|
    contributes sum(p). All four sparse forms must reproduce the dense keras
    value — jax.nn.one_hot has the same zero-row semantics, so the dense
    forms are the oracle."""
    import jax

    rng = np.random.default_rng(11)
    c = 16
    probs = jnp.asarray(rng.random((2, 4, 4, c)), jnp.float32)
    probs = probs / jnp.sum(probs, -1, keepdims=True)
    labels = np.asarray(rng.integers(0, c, (2, 4, 4)), np.int32)
    labels[0, 0, 0] = c + 5  # scatter-sum collision
    labels[1, 2, 3] = 2 * c  # another out-of-range value
    labels = jnp.asarray(labels)
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)  # zero rows OOR

    # probs forms vs dense keras forms
    dense_cce = losses.categorical_crossentropy_probs(onehot, probs)
    np.testing.assert_allclose(
        losses.sparse_categorical_crossentropy_probs(labels, probs),
        dense_cce,
        rtol=1e-6,
    )
    dense_l1 = jnp.mean(jnp.abs(onehot - probs))
    np.testing.assert_allclose(
        losses.onehot_l1_probs(labels, probs), dense_l1, rtol=1e-5
    )

    # logits forms vs the same dense forms composed with softmax
    logits = jnp.asarray(rng.normal(0, 3, (2, 4, 4, c)), jnp.float32)
    sm = jax.nn.softmax(logits, axis=-1)
    np.testing.assert_allclose(
        losses.sparse_categorical_crossentropy_logits(labels, logits),
        losses.categorical_crossentropy_probs(onehot, sm),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        losses.onehot_l1_logits(labels, logits),
        jnp.mean(jnp.abs(onehot - sm)),
        rtol=1e-5,
    )

    # gradient parity: the TF graph's gradient through an all-zero one-hot
    # row is (numerically) zero for both terms; ours must match the dense
    # autodiff exactly.
    def dense_form(z):
        p = jax.nn.softmax(z, axis=-1)
        return losses.categorical_crossentropy_probs(
            onehot, p
        ) + jnp.mean(jnp.abs(onehot - p))

    def sparse_form(z):
        return losses.sparse_categorical_crossentropy_logits(
            labels, z
        ) + losses.onehot_l1_logits(labels, z)

    g_dense = jax.grad(dense_form)(logits)
    g_sparse = jax.grad(sparse_form)(logits)
    np.testing.assert_allclose(g_sparse, g_dense, rtol=1e-4, atol=1e-6)


def test_logits_cce_matches_probs_form():
    """The log-space CCE (the indexed train path) equals the keras probs form
    composed with softmax — values and gradients (pix2pix_model.py:265)."""
    import jax

    rng = np.random.default_rng(8)
    # include extreme logits so the keras clip binds on both sides
    logits = jnp.asarray(rng.normal(0, 8, (2, 4, 4, 16)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 16, (2, 4, 4)), jnp.int32)

    def probs_form(z):
        return losses.sparse_categorical_crossentropy_probs(
            labels, jax.nn.softmax(z, axis=-1)
        )

    def logits_form(z):
        return losses.sparse_categorical_crossentropy_logits(labels, z)

    np.testing.assert_allclose(logits_form(logits), probs_form(logits), rtol=1e-5)
    g_probs = jax.grad(probs_form)(logits)
    g_logits = jax.grad(logits_form)(logits)
    np.testing.assert_allclose(g_logits, g_probs, rtol=1e-4, atol=1e-7)

    # clip regime: a certain prediction (p_t > 1 - eps) must yield the
    # clipped loss value and a zero gradient, exactly like keras clip_by_value
    sure = jnp.zeros((1, 1, 1, 16), jnp.float32).at[..., 3].set(60.0)
    lab = jnp.full((1, 1, 1), 3, jnp.int32)
    val = losses.sparse_categorical_crossentropy_logits(lab, sure)
    np.testing.assert_allclose(val, -np.log1p(-losses.KERAS_EPSILON), rtol=1e-6)
    g = jax.grad(lambda z: losses.sparse_categorical_crossentropy_logits(lab, z))(sure)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_logits_l1_matches_probs_form():
    import jax

    rng = np.random.default_rng(9)
    logits = jnp.asarray(rng.normal(0, 3, (2, 4, 4, 16)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 16, (2, 4, 4)), jnp.int32)
    probs_form = losses.onehot_l1_probs(labels, jax.nn.softmax(logits, axis=-1))
    logits_form = losses.onehot_l1_logits(labels, logits)
    np.testing.assert_allclose(logits_form, probs_form, rtol=1e-5)
