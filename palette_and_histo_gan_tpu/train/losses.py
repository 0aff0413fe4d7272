"""GAN losses with keras-parity reductions.

The reference uses tf.keras.losses.BinaryCrossentropy(from_logits=True)
(pix2pix_model.py:19) and CategoricalCrossentropy(from_logits=False)
(pix2pix_model.py:265). Both reduce per-element losses by a mean over the
last axis and then a mean over everything else — numerically equal to a plain
mean over all elements; golden-tested against keras in tests/test_losses.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

KERAS_EPSILON = 1e-7  # keras backend epsilon, used by its prob-input CCE


def bce_with_logits(labels: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Mean sigmoid cross-entropy, keras BinaryCrossentropy(from_logits=True)."""
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))


def categorical_crossentropy_probs(
    y_true: jnp.ndarray, probs: jnp.ndarray
) -> jnp.ndarray:
    """keras CategoricalCrossentropy(from_logits=False) on probabilities.

    keras renormalizes the prob vector, clips to [eps, 1-eps], then takes
    -sum(y_true * log(p)) over the class axis and a mean over the rest.
    """
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = jnp.clip(probs, KERAS_EPSILON, 1.0 - KERAS_EPSILON)
    per_example = -jnp.sum(y_true * jnp.log(probs), axis=-1)
    return jnp.mean(per_example)


def _select_label(labels: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """values[..., label] via a comparison mask + reduction.

    On TPU a masked sum beats take_along_axis (gathers are slow) and avoids
    materializing a float one-hot tensor; the bool mask fuses into the
    reduction. Exact for any values (exactly one mask element is true per
    position). Out-of-range labels select nothing and return 0 — callers
    that need tf.one_hot's all-zero-row semantics must mask with
    `_valid_label` themselves."""
    classes = values.shape[-1]
    class_ids = jax.lax.broadcasted_iota(jnp.int32, (classes,), 0)
    mask = labels[..., None] == class_ids
    return jnp.sum(jnp.where(mask, values, 0.0), axis=-1)


def _valid_label(labels: jnp.ndarray, classes: int) -> jnp.ndarray:
    """True where tf.one_hot(label, classes) has a one (i.e. 0 <= label < C).

    The indexed dataset can produce labels > 255: rgba_to_indexed reproduces
    the reference's tf.scatter_nd index-sum quirk (ops/palette.py), so a pixel
    matching its palette slot *and* hotpink filler slots gets the SUM of the
    matching indices. The reference then takes tf.one_hot(label, 256)
    (pix2pix_model.py:300), whose out-of-range rows are all-zero — keras CCE
    contributes 0 there and |onehot - probs| contributes sum(p). The sparse
    forms below reproduce exactly that."""
    return (labels >= 0) & (labels < classes)


_select_label_prob = _select_label  # historical name


def sparse_categorical_crossentropy_probs(
    labels: jnp.ndarray, probs: jnp.ndarray
) -> jnp.ndarray:
    """Same value as categorical_crossentropy_probs(one_hot(labels), probs),
    but the log runs only on the (B, H, W) selected entries instead of the
    full (B, H, W, 256) tensor: renormalize, clip, -log, mean.

    Out-of-range labels (see _valid_label) contribute 0, matching keras CCE
    on tf.one_hot's all-zero row."""
    total = jnp.sum(probs, axis=-1)
    p_t = _select_label_prob(labels, probs)
    p_t = jnp.clip(p_t / total, KERAS_EPSILON, 1.0 - KERAS_EPSILON)
    valid = _valid_label(labels, probs.shape[-1])
    return jnp.mean(jnp.where(valid, -jnp.log(p_t), 0.0))


def onehot_l1_probs(labels: jnp.ndarray, probs: jnp.ndarray) -> jnp.ndarray:
    """mean |one_hot(labels) - probs| without the |.| over the full tensor.

    With p >= 0: sum_c |1[c=t] - p_c| = (1 - p_t) + (sum_c p_c - p_t), so the
    class-mean is (1 + sum p - 2 p_t) / C — exact, not an approximation.
    Out-of-range labels have an all-zero one-hot row (see _valid_label), so
    their class-sum is just sum_c p_c."""
    c = probs.shape[-1]
    total = jnp.sum(probs, axis=-1)
    p_t = _select_label_prob(labels, probs)
    valid = _valid_label(labels, c)
    return jnp.mean(jnp.where(valid, 1.0 + total - 2.0 * p_t, total) / c)


# ---------------------------------------------------------------------------
# Log-space forms: same keras CCE/L1 values straight from logits, so the
# (B, H, W, 256) softmax tensor of the indexed generator
# (pix2pix_model.py:267-268 "softmax" head, :265 CCE, :273-278) is never
# materialized — only a fused logsumexp and a masked select touch the full
# logits tensor. The backward of logsumexp recomputes softmax in one pass.
# ---------------------------------------------------------------------------


def sparse_categorical_crossentropy_logits(
    labels: jnp.ndarray, logits: jnp.ndarray
) -> jnp.ndarray:
    """Same value as sparse_categorical_crossentropy_probs(labels,
    softmax(logits)), computed in log-space.

    With p = softmax(z): sum(p) == 1 so the keras renormalize is the
    identity, and -log(clip(p_t, eps, 1-eps)) == clip(lse - z_t,
    -log(1-eps), -log(eps)). jnp.clip's zero-gradient-outside-bounds matches
    keras' clip_by_value exactly (both kill the gradient where the clip
    binds). Equality with the probs form is asserted in tests/test_losses.py.

    Out-of-range labels (scatter-sum quirk, see _valid_label) contribute 0
    with a zero gradient — exactly keras CCE on the all-zero one-hot row.
    """
    lse = jax.scipy.special.logsumexp(
        logits.astype(jnp.float32), axis=-1
    )
    z_t = _select_label(labels, logits).astype(jnp.float32)
    neg_logp = lse - z_t
    lo = -jnp.log1p(-KERAS_EPSILON)  # binds when p_t > 1 - eps
    hi = -jnp.log(KERAS_EPSILON)  # binds when p_t < eps
    valid = _valid_label(labels, logits.shape[-1])
    return jnp.mean(jnp.where(valid, jnp.clip(neg_logp, lo, hi), 0.0))


def onehot_l1_logits(labels: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Same value as onehot_l1_probs(labels, softmax(logits)): with
    total == 1 the class-mean is 2 * (1 - p_t) / C, and
    p_t = exp(z_t - logsumexp(z)).

    Out-of-range labels (see _valid_label) contribute sum(p)/C = 1/C with a
    zero gradient (d sum(softmax)/dz = 0), matching |all-zero - probs|."""
    c = logits.shape[-1]
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    z_t = _select_label(labels, logits).astype(jnp.float32)
    p_t = jnp.exp(z_t - lse)
    valid = _valid_label(labels, c)
    return jnp.mean(jnp.where(valid, 2.0 * (1.0 - p_t), 1.0) / c)


def generator_loss(
    fake_predicted: jnp.ndarray,
    fake_image: jnp.ndarray,
    real_image: jnp.ndarray,
    lambda_l1: float,
) -> dict:
    """Baseline generator loss (pix2pix_model.py:44-49)."""
    adversarial = bce_with_logits(jnp.ones_like(fake_predicted), fake_predicted)
    # subtract and accumulate in f32 even when both operands arrive bf16
    # (bf16 train step with the fused augment kernel): the f32 difference of
    # two bf16 values is exact, and a bf16 mean over B*H*W*C elements would
    # lose the metric to accumulation rounding. In f32 mode the casts are
    # no-ops (today's exact numerics, promotion already ran the op in f32).
    l1 = jnp.mean(
        jnp.abs(
            real_image.astype(jnp.float32) - fake_image.astype(jnp.float32)
        )
    )
    return {
        "total_loss": adversarial + lambda_l1 * l1,
        "adversarial_loss": adversarial,
        "l1_loss": l1,
    }


def discriminator_loss(
    real_predicted: jnp.ndarray, fake_predicted: jnp.ndarray
) -> dict:
    """PatchGAN discriminator loss (pix2pix_model.py:51-56)."""
    real = bce_with_logits(jnp.ones_like(real_predicted), real_predicted)
    fake = bce_with_logits(jnp.zeros_like(fake_predicted), fake_predicted)
    return {"total_loss": fake + real, "real_loss": real, "fake_loss": fake}
