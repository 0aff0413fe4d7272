"""Generate network-level golden parity fixtures with TensorFlow.

Builds the reference's exact U-Net generator + PatchGAN discriminator
topology (/root/reference/networks.py:7-98) out of raw tf.nn ops with
deterministically generated weights (tests/parity_utils.py — both the TF and
JAX sides regenerate the same arrays from canonical names, so the fixture
only stores inputs, outputs and loss scalars, not 120 MB of weights), runs a
deterministic forward (dropout disabled — its RNG cannot be matched across
frameworks; InstanceNorm has no train/eval mode), computes one train-step's
generator/discriminator loss values per the reference formulas
(pix2pix_model.py:44-56, :273-287, histogram.py:35-89), and pins everything
into tests/golden/networks_{rgba,indexed}.npz.

Layer semantics reproduced (probed against keras layers, see
tests/parity_utils.py docstring):
  - keras Conv2D(k4, s2/s1, SAME)        == tf.nn.conv2d, same kernel layout
  - keras Conv2DTranspose(k4, s2, SAME)  == tf.nn.conv2d_transpose with
    output_shape = 2*input (keras core lowering)
  - tfa InstanceNormalization            == per-(sample, channel) moments
    over (H, W), eps 1e-3, per-channel gamma/beta (tfa GroupNormalization
    with groups == channels; tfa itself is not installed under TF 2.21)
  - keras LeakyReLU() default slope 0.3

Run from the repo root:  python scripts/make_golden_networks.py
"""

import os
import sys

os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from tf_reference_nets import (  # noqa: E402
    bce,
    cce,
    discriminator_forward,
    generator_forward,
    pu,
    tf,
    tf_hellinger,
    tf_rgbuv_histogram,
)

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)


def rgbuv_histogram(imgs, size=64, sigma=0.02):
    """Reference differentiable histogram values (histogram.py:35-81), in
    numpy: [-1,1]->[0,1], drop alpha, intensity sqrt(R^2+G^2+B^2+eps),
    log-chroma u/v per channel, inverse-quadratic kernel over
    linspace(-3, 3, size), normalized to sum 1."""
    eps = 1e-6
    x = (np.asarray(imgs, np.float64) + 1.0) / 2.0
    x = x[..., :3].reshape(x.shape[0], -1, 3)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    iy = np.sqrt(r**2 + g**2 + b**2 + eps)
    domain = np.linspace(-3.0, 3.0, size)
    hists = []
    for c, p1, p2 in ((r, g, b), (g, r, b), (b, r, g)):
        iu = np.log(c + eps) - np.log(p1 + eps)
        iv = np.log(c + eps) - np.log(p2 + eps)
        du = (iu[..., None] - domain[None, None, :]) ** 2 / sigma**2
        dv = (iv[..., None] - domain[None, None, :]) ** 2 / sigma**2
        ku = 1.0 / (1.0 + du)  # inverse-quadratic kernel (histogram.py:26-27)
        kv = 1.0 / (1.0 + dv)
        hists.append(np.einsum("bn,bnu,bnv->buv", iy, ku, kv))
    h = np.stack(hists, axis=-1)  # (B, size, size, 3)
    norm = h.reshape(h.shape[0], -1).sum(-1)[:, None, None, None]
    return h / norm


def hellinger(h1, h2):
    """histogram.py:84-89: 1/sqrt(2) * ||sqrt(h1)-sqrt(h2)||_2 / B."""
    d = np.sqrt(h1) - np.sqrt(h2)
    return (1.0 / np.sqrt(2.0)) * np.sqrt((d**2).sum()) / h1.shape[0]


def save(name, **arrays):
    np.savez(os.path.join(OUT, name + ".npz"), **arrays)
    total = sum(a.nbytes for a in arrays.values())
    print(f"wrote {name}.npz ({total/1e6:.2f} MB): {', '.join(arrays)}")


# Pin policy (norm + full-for-small + random projections for large) lives
# in tests/parity_utils.py so every fixture writer shares it.
grad_fixture_arrays = pu.grad_fixture_arrays


def taped_gradients(wg, wd, losses_fn):
    """One reference train step's gradients (pix2pix_model.py:62-83): one
    persistent tape over a SHARED forward (fake / d_real / d_fake computed
    once), then G-loss grads w.r.t. generator vars and D-loss grads w.r.t.
    discriminator vars. losses_fn(gv, dv) -> (g_loss, d_loss). A None
    gradient (a var reachable only through argmax) becomes zeros, matching
    JAX's zero cotangent for integer-blocked paths."""
    gv = {k: tf.Variable(v) for k, v in wg.items()}
    dv = {k: tf.Variable(v) for k, v in wd.items()}
    with tf.GradientTape(persistent=True) as tape:
        g_loss, d_loss = losses_fn(gv, dv)
    g_grads = tape.gradient(g_loss, gv)
    d_grads = tape.gradient(d_loss, dv)
    del tape
    zero = lambda k, g, w: np.zeros_like(w[k]) if g is None else g.numpy()
    return (
        {k: zero(k, g, wg) for k, g in g_grads.items()},
        {k: zero(k, g, wd) for k, g in d_grads.items()},
    )


# --- RGBA topology (baseline / histogram variants) --------------------------
B = 2
wg = pu.materialize(pu.generator_param_spec(4, 4))
wd = pu.materialize(pu.discriminator_param_spec(4))
source = pu.parity_input("networks/rgba/source", (B, 64, 64, 4))
real = pu.parity_input("networks/rgba/real", (B, 64, 64, 4))

fake = generator_forward(wg, tf.constant(source), "tanh")
d_real = discriminator_forward(wd, tf.constant(real), tf.constant(source))
d_fake = discriminator_forward(wd, fake, tf.constant(source))

g_adv = bce(tf.ones_like(d_fake), d_fake).numpy()
l1 = tf.reduce_mean(tf.abs(tf.constant(real) - fake)).numpy()
d_real_loss = bce(tf.ones_like(d_real), d_real).numpy()
d_fake_loss = bce(tf.zeros_like(d_fake), d_fake).numpy()
hist_real = rgbuv_histogram(real)
hist_fake = rgbuv_histogram(fake.numpy())
hell = hellinger(hist_real, hist_fake)

save(
    "networks_rgba",
    source=source,
    real=real,
    fake=fake.numpy(),
    d_real=d_real.numpy(),
    d_fake=d_fake.numpy(),
    g_adversarial=np.float32(g_adv),
    g_l1=np.float32(l1),
    g_total_baseline=np.float32(g_adv + 100.0 * l1),
    g_total_histogram=np.float32(g_adv + 30.0 * l1 + 1.0 * hell),
    hellinger=np.float32(hell),
    d_real_loss=np.float32(d_real_loss),
    d_fake_loss=np.float32(d_fake_loss),
    d_total=np.float32(d_real_loss + d_fake_loss),
)


# --- RGBA gradient parity (one baseline train step's tape.gradient) ---------
def rgba_losses(gv, dv):
    fake_t = generator_forward(gv, tf.constant(source), "tanh")
    d_real_t = discriminator_forward(dv, tf.constant(real), tf.constant(source))
    d_fake_t = discriminator_forward(dv, fake_t, tf.constant(source))
    g_loss = bce(tf.ones_like(d_fake_t), d_fake_t) + 100.0 * tf.reduce_mean(
        tf.abs(tf.constant(real) - fake_t)
    )  # pix2pix_model.py:44-49
    d_loss = bce(tf.ones_like(d_real_t), d_real_t) + bce(
        tf.zeros_like(d_fake_t), d_fake_t
    )  # pix2pix_model.py:51-56
    return g_loss, d_loss


gg, dg = taped_gradients(wg, wd, rgba_losses)
save(
    "networks_grads_rgba",
    **grad_fixture_arrays(gg, "g."),
    **grad_fixture_arrays(dg, "d."),
)


# --- histogram-variant gradient parity ---------------------------------------
# The reference's differentiable histogram in TF ops (histogram.py:5-89 run
# under the tape), so the G gradient pins the JAX fused histogram VJP
# against TF autodiff THROUGH the generator — not just against JAX autodiff
# (tests/test_histogram.py). D grads are the same formulas as the baseline
# step and are pinned there. (tf_rgbuv_histogram / tf_hellinger live in
# scripts/tf_reference_nets.py, shared with the trajectory fixtures.)
def histogram_losses(gv, dv):
    fake_t = generator_forward(gv, tf.constant(source), "tanh")
    d_real_t = discriminator_forward(dv, tf.constant(real), tf.constant(source))
    d_fake_t = discriminator_forward(dv, fake_t, tf.constant(source))
    hell_t = tf_hellinger(
        tf_rgbuv_histogram(tf.constant(real)), tf_rgbuv_histogram(fake_t)
    )
    g_loss = (
        bce(tf.ones_like(d_fake_t), d_fake_t)
        + 30.0 * tf.reduce_mean(tf.abs(tf.constant(real) - fake_t))
        + 1.0 * hell_t
    )  # pix2pix_model.py:242-250, lambdas from notebook cell 9
    d_loss = bce(tf.ones_like(d_real_t), d_real_t) + bce(
        tf.zeros_like(d_fake_t), d_fake_t
    )
    return g_loss, d_loss


ggh, dgh = taped_gradients(wg, wd, histogram_losses)
save(
    "networks_grads_histogram",
    **grad_fixture_arrays(ggh, "g."),
    **grad_fixture_arrays(dgh, "d."),
)


# --- optimizer parity: two keras Adam updates, pinned parameter deltas -------
# keras Adam(2e-4, beta_1=0.5), epsilon default 1e-7 (pix2pix_model.py:28-29)
# over the generator variables with deterministic synthetic gradients
# (regenerable on the JAX side from the same names, like the weights —
# exact inputs, so the fixture isolates optimizer semantics: lr, beta1,
# beta2, eps placement, and t=1/t=2 bias correction; two DIFFERENT
# gradients so step 2 exercises genuine moment mixing). Deltas are pinned
# whole for small vars and by L2 norm for all.
opt = tf.keras.optimizers.Adam(learning_rate=2e-4, beta_1=0.5)
gvars = {k: tf.Variable(v) for k, v in wg.items()}
names = sorted(gvars)
syn1 = {k: pu.make_param(k + "#adam_g1", wg[k].shape, "conv") for k in names}
syn2 = {k: pu.make_param(k + "#adam_g2", wg[k].shape, "conv") for k in names}
w_prev = {k: gvars[k].numpy().copy() for k in names}
opt.apply_gradients(
    zip([tf.constant(syn1[k]) for k in names], [gvars[k] for k in names])
)
delta1 = {k: gvars[k].numpy() - w_prev[k] for k in names}
w_prev = {k: gvars[k].numpy().copy() for k in names}
opt.apply_gradients(
    zip([tf.constant(syn2[k]) for k in names], [gvars[k] for k in names])
)
delta2 = {k: gvars[k].numpy() - w_prev[k] for k in names}
save(
    "networks_adam",
    **grad_fixture_arrays(delta1, "s1."),
    **grad_fixture_arrays(delta2, "s2."),
)

# --- indexed topology (1 -> 256 softmax G, 1-channel D) ---------------------
rng = np.random.default_rng(pu.zlib.crc32(b"networks/indexed"))
source_idx = rng.integers(0, 256, size=(B, 64, 64, 1)).astype(np.float32)
real_idx = rng.integers(0, 256, size=(B, 64, 64, 1)).astype(np.int32)

wgi = pu.materialize(pu.generator_param_spec(1, 256))
wdi = pu.materialize(pu.discriminator_param_spec(1))

probs = generator_forward(wgi, tf.constant(source_idx), "softmax")
fake_idx = tf.expand_dims(
    tf.argmax(probs, axis=-1, output_type=tf.int32), -1
)  # pix2pix_model.py:287
d_real_i = discriminator_forward(
    wdi, tf.cast(real_idx, tf.float32), tf.constant(source_idx)
)
d_fake_i = discriminator_forward(
    wdi, tf.cast(fake_idx, tf.float32), tf.constant(source_idx)
)
one_hot = tf.reshape(
    tf.one_hot(real_idx, 256, axis=-1), [B, 64, 64, -1]
)  # pix2pix_model.py:300-301
seg = cce(one_hot, probs).numpy()
g_adv_i = bce(tf.ones_like(d_fake_i), d_fake_i).numpy()
l1_i = tf.reduce_mean(tf.abs(one_hot - probs)).numpy()  # reported, weight 0
d_real_loss_i = bce(tf.ones_like(d_real_i), d_real_i).numpy()
d_fake_loss_i = bce(tf.zeros_like(d_fake_i), d_fake_i).numpy()

save(
    "networks_indexed",
    source=source_idx,
    real=real_idx,
    probs_slice=probs.numpy()[:, ::8, ::8, :],  # full tensor is 8 MB; pin a grid
    fake_idx=fake_idx.numpy(),
    d_real=d_real_i.numpy(),
    d_fake=d_fake_i.numpy(),
    g_adversarial=np.float32(g_adv_i),
    g_l1=np.float32(l1_i),
    segmentation=np.float32(seg),
    g_total=np.float32(g_adv_i + 0.0 * l1_i + 0.01 * seg),
    d_real_loss=np.float32(d_real_loss_i),
    d_fake_loss=np.float32(d_fake_loss_i),
    d_total=np.float32(d_real_loss_i + d_fake_loss_i),
)


# --- indexed gradient parity (pins the argmax gradient topology) ------------
# The adversarial term reaches G only through argmax -> int cast, so its
# gradient contribution to G is exactly zero on both sides (the reference
# quirk, pix2pix_model.py:303-309); G trains on 0.01*CCE alone. D grads flow
# normally from both BCE terms.
def indexed_losses(gv, dv):
    probs_t = generator_forward(gv, tf.constant(source_idx), "softmax")
    fake_idx_t = tf.expand_dims(
        tf.argmax(probs_t, axis=-1, output_type=tf.int32), -1
    )
    d_real_t = discriminator_forward(
        dv, tf.cast(real_idx, tf.float32), tf.constant(source_idx)
    )
    d_fake_t = discriminator_forward(
        dv, tf.cast(fake_idx_t, tf.float32), tf.constant(source_idx)
    )
    one_hot_t = tf.reshape(tf.one_hot(real_idx, 256, axis=-1), [B, 64, 64, -1])
    g_loss = bce(tf.ones_like(d_fake_t), d_fake_t) + 0.01 * cce(
        one_hot_t, probs_t
    )  # pix2pix_model.py:273-278, lambda_segmentation=0.01
    d_loss = bce(tf.ones_like(d_real_t), d_real_t) + bce(
        tf.zeros_like(d_fake_t), d_fake_t
    )
    return g_loss, d_loss


ggi, dgi = taped_gradients(wgi, wdi, indexed_losses)
save(
    "networks_grads_indexed",
    **grad_fixture_arrays(ggi, "g."),
    **grad_fixture_arrays(dgi, "d."),
)

print("done")
