"""The reference networks and losses as raw TF ops, shared by the golden
fixture generators.

Builds the reference's exact U-Net generator + PatchGAN discriminator
topology (/root/reference/networks.py:7-98) out of raw tf.nn ops, plus the
reference's differentiable rgb-uv histogram and Hellinger distance
(/root/reference/histogram.py:5-89) as TF ops, so tape.gradient runs TF's
own autodiff through the reference formulas. Consumed by
scripts/make_golden_networks.py (single-step pins),
scripts/make_golden_trajectory.py (N-step closed-loop pins), and
scripts/reference_train_tf.py (the measured reference-side training
baseline).

Layer semantics reproduced (probed against keras layers, see
tests/parity_utils.py docstring):
  - keras Conv2D(k4, s2/s1, SAME)        == tf.nn.conv2d, same kernel layout
  - keras Conv2DTranspose(k4, s2, SAME)  == tf.nn.conv2d_transpose with
    output_shape = 2*input (keras core lowering)
  - tfa InstanceNormalization            == per-(sample, channel) moments
    over (H, W), eps 1e-3, per-channel gamma/beta (tfa GroupNormalization
    with groups == channels; tfa itself is not installed under TF 2.21)
  - keras LeakyReLU() default slope 0.3
"""

import os
import sys

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np
import tensorflow as tf

# parity_utils imports the package (for the converter specs), so the repo
# root must be importable — the package is not pip-installed.
_repo_root = os.path.join(os.path.dirname(__file__), "..")
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)
from tests import parity_utils as pu  # noqa: E402

bce = tf.keras.losses.BinaryCrossentropy(from_logits=True)
cce = tf.keras.losses.CategoricalCrossentropy(from_logits=False)


def instance_norm(x, scale, offset, eps=1e-3):
    mean, var = tf.nn.moments(x, axes=[1, 2], keepdims=True)
    return (x - mean) * tf.math.rsqrt(var + eps) * scale + offset


def generator_forward(w, x, last_activation, dropout_rng=None):
    """Reference U-Net forward (networks.py:53-98).

    dropout_rng: None disables dropout (the parity-fixture convention —
    dropout RNG cannot be matched across frameworks); a tf.random.Generator
    enables the reference's always-on rate-0.5 dropout on the first three
    up-blocks (networks.py:30-33) for runs that keep the training-time
    stochasticity (scripts/reference_train_tf.py's measured baseline).
    """
    skips = []
    inputs = x
    for i, f in enumerate(pu.DOWN_FILTERS):
        x = tf.nn.conv2d(x, w[f"gen/down{i}/conv"], strides=2, padding="SAME")
        if i != 0:
            x = instance_norm(
                x, w[f"gen/down{i}/norm/scale"], w[f"gen/down{i}/norm/offset"]
            )
        x = tf.nn.leaky_relu(x, alpha=0.3)
        skips.append(x)
    skip_sources = list(reversed(skips[:-1])) + [inputs]
    for i, f in enumerate(pu.UP_FILTERS):
        b, h, ww = x.shape[0], x.shape[1], x.shape[2]
        x = tf.nn.conv2d_transpose(
            x,
            w[f"gen/up{i}/convt"],
            output_shape=(b, 2 * h, 2 * ww, f),
            strides=2,
            padding="SAME",
        )
        x = instance_norm(
            x, w[f"gen/up{i}/norm/scale"], w[f"gen/up{i}/norm/offset"]
        )
        if i < 3 and dropout_rng is not None:
            # keras Dropout(0.5) under training=True: scale kept units by 2
            keep = tf.cast(
                dropout_rng.uniform(tf.shape(x)) >= 0.5, x.dtype
            )
            x = x * keep * 2.0
        x = tf.nn.relu(x)
        x = tf.concat([x, skip_sources[i]], axis=-1)
    x = tf.nn.conv2d(x, w["gen/head/conv"], strides=1, padding="SAME")
    x = x + w["gen/head/bias"]
    if last_activation == "tanh":
        return tf.tanh(x)
    assert last_activation == "softmax"
    return tf.nn.softmax(x, axis=-1)


def discriminator_forward(w, target, source):
    """Reference PatchGAN forward (networks.py:39-50): concat -> down(64,
    no-norm) -> 1-channel conv head."""
    x = tf.concat([target, source], axis=-1)
    x = tf.nn.conv2d(x, w["disc/down/conv"], strides=2, padding="SAME")
    x = tf.nn.leaky_relu(x, alpha=0.3)
    x = tf.nn.conv2d(x, w["disc/head/conv"], strides=1, padding="SAME")
    return x + w["disc/head/bias"]


def tf_rgbuv_histogram(imgs, size=64, sigma=0.02):
    """The reference's differentiable histogram in TF ops (histogram.py:5-81
    run under the tape): [-1,1]->[0,1], drop alpha, intensity
    sqrt(R^2+G^2+B^2+eps), log-chroma u/v per channel, inverse-quadratic
    kernel over linspace(-3, 3, size), normalized to sum 1."""
    eps = 1e-6
    x = (imgs + 1.0) / 2.0  # histogram.py:58
    x = tf.reshape(x[..., :3], [x.shape[0], -1, 3])  # :61-63
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    iy = tf.sqrt(r**2 + g**2 + b**2 + eps)  # :66
    domain = tf.linspace(-3.0, 3.0, size)  # :55
    hists = []
    for c, p1, p2 in ((r, g, b), (g, r, b), (b, r, g)):
        iu = tf.math.log(c + eps) - tf.math.log(p1 + eps)  # :13-17
        iv = tf.math.log(c + eps) - tf.math.log(p2 + eps)
        du = tf.square(iu[..., None] - domain) / sigma**2
        dv = tf.square(iv[..., None] - domain) / sigma**2
        ku = 1.0 / (1.0 + du)  # inverse-quadratic (:26-27)
        kv = 1.0 / (1.0 + dv)
        # (Iy*Ku)^T @ Kv batched matmul (:29-30)
        hists.append(tf.einsum("bn,bnu,bnv->buv", iy, ku, kv))
    h = tf.stack(hists, axis=-1)
    norm = tf.reduce_sum(tf.reshape(h, [h.shape[0], -1]), -1)[:, None, None, None]
    return h / norm  # :75-79


def tf_hellinger(h1, h2):
    """histogram.py:84-89: 1/sqrt(2) * ||sqrt(h1)-sqrt(h2)||_2 / B."""
    d = tf.sqrt(h1) - tf.sqrt(h2)
    return (
        (1.0 / np.sqrt(2.0).astype(np.float32))
        * tf.norm(tf.reshape(d, [-1]))
        / np.float32(h1.shape[0])
    )
