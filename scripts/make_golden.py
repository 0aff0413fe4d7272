"""Generate golden parity fixtures for the test suite using TensorFlow ops.

The reference implementation is TF 2.x; its observable behavior flows through
public TF APIs (tf.image.adjust_hue, tf.raw_ops.UniqueWithCountsV2,
tf.raw_ops.ImageProjectiveTransformV3, keras losses). This script evaluates
those APIs on fixed random inputs and pins the results into
tests/golden/*.npz, so the JAX/Pallas implementations can be parity-tested
without TF installed at test time.

Run from the repo root:  python scripts/make_golden.py
"""

import os

os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

import numpy as np
import tensorflow as tf

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(47)


def save(name, **arrays):
    np.savez(os.path.join(OUT, name + ".npz"), **arrays)
    print(f"wrote {name}.npz: {', '.join(arrays)}")


# --- hue rotation on [0, 255] floats (reference applies it pre-normalize) ---
imgs = rng.integers(0, 256, size=(4, 8, 8, 3)).astype(np.float32)
deltas = np.array([-0.5, -0.25, 0.11, 0.49], dtype=np.float32)
outs = np.stack(
    [tf.image.adjust_hue(imgs[i], deltas[i]).numpy() for i in range(4)]
)
save("hue", images=imgs, deltas=deltas, expected=outs)

# --- projective translation, nearest interp, constant fill 0 ---------------
# keras RandomTranslation lowers to ImageProjectiveTransformV3 with
# transform [1, 0, -dx, 0, 1, -dy, 0, 0]  (output(y,x) = input(y-dy, x-dx))
imgs = rng.integers(0, 256, size=(3, 16, 16, 8)).astype(np.float32)
offsets = np.array([[3.0, -5.0], [-9.6, 4.8], [2.3, -1.7]], dtype=np.float32)  # (dy, dx)
outs = []
for i in range(3):
    dy, dx = offsets[i]
    transform = np.array([[1, 0, -dx, 0, 1, -dy, 0, 0]], dtype=np.float32)
    out = tf.raw_ops.ImageProjectiveTransformV3(
        images=imgs[i : i + 1],
        transforms=transform,
        output_shape=tf.constant([16, 16], tf.int32),
        interpolation="NEAREST",
        fill_mode="CONSTANT",
        fill_value=tf.constant(0.0),
    )
    outs.append(out.numpy()[0])
save("translate", images=imgs, offsets=offsets, expected=np.stack(outs))

# --- palette extraction: UniqueWithCountsV2 appearance order + orderings ---
# a small image with repeated colors, as int32 RGBA in [0, 255]
palette_pool = rng.integers(0, 256, size=(11, 4)).astype(np.int32)
choice = rng.integers(0, 11, size=(8, 8))
img = palette_pool[choice]  # (8, 8, 4)
flat = tf.reshape(tf.constant(img), [-1, 4])

hotpink = np.array([255, 0, 220, 255], dtype=np.int32)


def pad256(colors):
    colors = colors.numpy() if hasattr(colors, "numpy") else colors
    fill = np.broadcast_to(hotpink, (256 - len(colors), 4))
    return np.concatenate([colors, fill], axis=0).astype(np.int32)


c_t2b, _, _ = tf.raw_ops.UniqueWithCountsV2(x=flat, axis=[0])
c_b2t, _, _ = tf.raw_ops.UniqueWithCountsV2(x=flat[::-1], axis=[0])
gray = tf.squeeze(
    tf.matmul(
        tf.cast(c_t2b, tf.float32),
        tf.constant([0.2989, 0.5870, 0.1140, 0.0])[:, None],
    )
)
order = tf.argsort(gray, direction="ASCENDING", stable=True)
c_gray = tf.gather(c_t2b, order)
save(
    "palette",
    image=img,
    top2bottom=pad256(c_t2b),
    bottom2top=pad256(c_b2t),
    grayness=pad256(c_gray),
)

# --- rgba_to_indexed scatter-sum semantics ---------------------------------
pal = pad256(c_t2b)
flat_np = img.reshape(-1, 4)
eq = (flat_np[:, None, :] == pal[None, :, :]).all(-1)  # (N, 256)
expected_idx = (eq * np.arange(256)[None, :]).sum(-1).reshape(8, 8, 1)
save("indexed", image=img, palette=pal, expected=expected_idx.astype(np.int32))

# --- keras losses: BCE-from-logits, CCE-on-probs ----------------------------
logits = rng.normal(size=(4, 32, 32, 1)).astype(np.float32)
bce = tf.keras.losses.BinaryCrossentropy(from_logits=True)
bce_ones = bce(tf.ones_like(logits), logits).numpy()
bce_zeros = bce(tf.zeros_like(logits), logits).numpy()

probs = rng.random(size=(2, 4, 4, 16)).astype(np.float32)
probs /= probs.sum(-1, keepdims=True)
onehot = np.eye(16, dtype=np.float32)[rng.integers(0, 16, size=(2, 4, 4))]
cce = tf.keras.losses.CategoricalCrossentropy(from_logits=False)
cce_val = cce(onehot, probs).numpy()
save(
    "losses",
    logits=logits,
    bce_ones=np.float32(bce_ones),
    bce_zeros=np.float32(bce_zeros),
    probs=probs,
    onehot=onehot,
    cce=np.float32(cce_val),
)

# --- rgb<->hsv roundtrip values ---------------------------------------------
rgb = rng.random(size=(64, 3)).astype(np.float32) * 255.0
hsv = tf.image.rgb_to_hsv(rgb).numpy()
save("hsv", rgb=rgb, hsv=hsv)

print("done")
