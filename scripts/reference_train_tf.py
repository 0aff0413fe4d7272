"""Measured REFERENCE-side training baseline: the reference formulas in TF.

Trains the reference baseline-no-aug model (and optionally the histogram
variant) for a reduced schedule on the real vendored sprites in TF 2.21
CPU, using the raw-tf.nn reimplementation of the reference networks
(scripts/tf_reference_nets.py — the same code the golden parity fixtures
are generated with) and the shared regime (scripts/ref_regime.py: identical
init, batch order, eval protocol as the build's comparison run).

This produces the first *measured reference-side* loss/L1 trajectory to put
next to the build's numbers in BASELINE.md — before this, the build's
training-quality tables were self-measured only. The full reference
schedule (160 epochs) is hours on this 1-core host; the reduced schedule is
the comparison regime, run identically on both sides by
scripts/compare_reference_train.py.

Ref: /root/reference/side2side_model.py:67-122 (fit loop),
pix2pix_model.py:44-56 (losses), experiments.ipynb cell 10 (schedule).

Run from the repo root:
  python scripts/reference_train_tf.py --steps 1000 --out reference_train_tf.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

import ref_regime
from tf_reference_nets import (
    bce,
    cce,
    discriminator_forward,
    generator_forward,
    pu,
    tf,
    tf_hellinger,
    tf_rgbuv_histogram,
)


def train_indexed(steps: int, eval_every: int) -> dict:
    """The indexed family (pix2pix_model.py:295-325): G 1->256 softmax on
    index maps from the build's golden-tested dataset pipeline; the
    adversarial term is argmax-blocked so G trains on 0.01*CCE alone; eval
    is L1 on palette-DECODED [0,255] images (the reference's indexed
    protocol, pix2pix_model.py:433-452)."""
    (tr_src, tr_tgt, _), (te_src, te_tgt, te_pal) = ref_regime.load_indexed_splits()
    order = ref_regime.batch_order(len(tr_src), steps)
    test_src_f = tf.constant(te_src.astype(np.float32))
    decoded_real = ref_regime.decode_indexed(te_tgt, te_pal)

    gv = {
        k: tf.Variable(v)
        for k, v in ref_regime.reference_init(pu.generator_param_spec(1, 256)).items()
    }
    dv = {
        k: tf.Variable(v)
        for k, v in ref_regime.reference_init(pu.discriminator_param_spec(1)).items()
    }
    g_opt = tf.keras.optimizers.Adam(2e-4, beta_1=0.5)
    d_opt = tf.keras.optimizers.Adam(2e-4, beta_1=0.5)
    ng, nd = sorted(gv), sorted(dv)
    b = ref_regime.BATCH

    @tf.function
    def step(src, real_idx):
        with tf.GradientTape(persistent=True) as tape:
            probs = generator_forward(gv, src, "softmax")
            fake_idx = tf.expand_dims(
                tf.argmax(probs, axis=-1, output_type=tf.int32), -1
            )  # pix2pix_model.py:287 — gradient-blocked
            d_real = discriminator_forward(
                dv, tf.cast(real_idx, tf.float32), src
            )
            d_fake = discriminator_forward(
                dv, tf.cast(fake_idx, tf.float32), src
            )
            one_hot = tf.reshape(
                tf.one_hot(real_idx, 256, axis=-1), [b, 64, 64, -1]
            )  # labels > 255 (scatter-sum quirk) one-hot to all-zero rows
            g_adv = bce(tf.ones_like(d_fake), d_fake)
            seg = cce(one_hot, probs)
            g_loss = g_adv + 0.01 * seg
            d_loss = bce(tf.ones_like(d_real), d_real) + bce(
                tf.zeros_like(d_fake), d_fake
            )
        g_grads = tape.gradient(g_loss, gv)
        d_grads = tape.gradient(d_loss, dv)
        g_grads = {
            k: (tf.zeros_like(gv[k]) if g is None else g)
            for k, g in g_grads.items()
        }
        g_opt.apply_gradients(zip([g_grads[k] for k in ng], [gv[k] for k in ng]))
        d_opt.apply_gradients(zip([d_grads[k] for k in nd], [dv[k] for k in nd]))
        return g_loss, d_loss, g_adv, seg

    @tf.function
    def test_fake_idx():
        probs = generator_forward(gv, test_src_f, "softmax")
        return tf.expand_dims(tf.argmax(probs, axis=-1, output_type=tf.int32), -1)

    curves = {"g_total": [], "d_total": [], "g_adv": [], "segmentation": []}
    eval_steps, eval_l1s = [], []
    t0 = time.time()
    for k in range(steps):
        idx = order[k]
        g_loss, d_loss, g_adv, seg = step(
            tf.constant(tr_src[idx].astype(np.float32)),
            tf.constant(tr_tgt[idx].astype(np.int32)),
        )
        curves["g_total"].append(float(g_loss))
        curves["d_total"].append(float(d_loss))
        curves["g_adv"].append(float(g_adv))
        curves["segmentation"].append(float(seg))
        if (k + 1) % eval_every == 0 or k == 0:
            decoded_fake = ref_regime.decode_indexed(
                test_fake_idx().numpy(), te_pal
            )
            l1 = float(np.abs(decoded_real - decoded_fake).mean())
            eval_steps.append(k + 1)
            eval_l1s.append(l1)
            print(
                f"step {k+1:5d}: G {float(g_loss):8.4f} D {float(d_loss):7.4f} "
                f"seg {float(seg):7.4f} test_l1 {l1:8.4f} "
                f"({time.time()-t0:6.1f}s)",
                flush=True,
            )
    wall = time.time() - t0
    return {
        "framework": f"tensorflow-{tf.__version__} (cpu, reference formulas)",
        "variant": "indexed",
        "steps": steps,
        "batch": b,
        "dropout": "off (comparability regime, see scripts/ref_regime.py)",
        "wall_seconds": wall,
        "curves": curves,
        "g_total_window_means": ref_regime.window_means(curves["g_total"]),
        "d_total_window_means": ref_regime.window_means(curves["d_total"]),
        "segmentation_window_means": ref_regime.window_means(curves["segmentation"]),
        "eval_steps": eval_steps,
        "eval_l1": eval_l1s,
    }


def _load_shared_inception(h5_path: str):
    """The shared-feature InceptionV3 for the cross-framework FID anchor:
    the reference's exact constructor (frechet_inception_distance.py:76)
    loaded with the weights scripts/make_shared_inception.py wrote (the
    same weights the build consumes as a converted .npz)."""
    model = tf.keras.applications.InceptionV3(
        include_top=False, pooling="avg", input_shape=(299, 299, 3), weights=None
    )
    model.load_weights(h5_path)
    return model


def train(
    variant: str,
    steps: int,
    eval_every: int,
    fid_at=(),
    inception_h5: str | None = None,
) -> dict:
    if variant == "indexed":
        return train_indexed(steps, eval_every)
    assert variant in ("baseline-no-aug", "histogram")
    inception = _load_shared_inception(inception_h5) if fid_at else None
    lambda_l1 = 100.0 if variant == "baseline-no-aug" else 30.0
    use_hist = variant == "histogram"

    train_src_u8, train_tgt_u8, test_src_u8, test_tgt_u8 = ref_regime.load_splits()
    train_src = ref_regime.normalize(train_src_u8)
    train_tgt = ref_regime.normalize(train_tgt_u8)
    test_src = tf.constant(ref_regime.normalize(test_src_u8))
    test_tgt = tf.constant(ref_regime.normalize(test_tgt_u8))
    order = ref_regime.batch_order(len(train_src), steps)

    gv = {
        k: tf.Variable(v)
        for k, v in ref_regime.reference_init(pu.generator_param_spec(4, 4)).items()
    }
    dv = {
        k: tf.Variable(v)
        for k, v in ref_regime.reference_init(pu.discriminator_param_spec(4)).items()
    }
    g_opt = tf.keras.optimizers.Adam(2e-4, beta_1=0.5)  # pix2pix_model.py:28
    d_opt = tf.keras.optimizers.Adam(2e-4, beta_1=0.5)
    ng, nd = sorted(gv), sorted(dv)

    @tf.function
    def step(src, tgt):
        with tf.GradientTape(persistent=True) as tape:
            fake = generator_forward(gv, src, "tanh")
            d_real = discriminator_forward(dv, tgt, src)
            d_fake = discriminator_forward(dv, fake, src)
            g_adv = bce(tf.ones_like(d_fake), d_fake)
            g_l1 = tf.reduce_mean(tf.abs(tgt - fake))
            g_loss = g_adv + lambda_l1 * g_l1
            if use_hist:
                g_loss = g_loss + tf_hellinger(
                    tf_rgbuv_histogram(tgt), tf_rgbuv_histogram(fake)
                )
            d_loss = bce(tf.ones_like(d_real), d_real) + bce(
                tf.zeros_like(d_fake), d_fake
            )
        g_grads = tape.gradient(g_loss, gv)
        d_grads = tape.gradient(d_loss, dv)
        g_opt.apply_gradients(zip([g_grads[k] for k in ng], [gv[k] for k in ng]))
        d_opt.apply_gradients(zip([d_grads[k] for k in nd], [dv[k] for k in nd]))
        return g_loss, d_loss, g_adv, g_l1

    @tf.function
    def eval_l1():
        # side2side_model.py evaluate_l1: mean |target - G(source)| on the
        # test split, [-1, 1] scale
        fake = generator_forward(gv, test_src, "tanh")
        return tf.reduce_mean(tf.abs(test_tgt - fake))

    curves = {"g_total": [], "d_total": [], "g_adv": [], "g_l1": []}
    eval_steps, eval_l1s = [], []
    fid_steps, fid_values = [], []
    # FID inputs are the [-1, 1] eval images straight from the variant's
    # select_examples_for_evaluation (pix2pix_model.py:112-122 — the RGBA
    # path never denormalizes; eval/fid.py documents the quirk chain)
    real_acts = (
        inception.predict(ref_regime.fid_preprocess(test_tgt.numpy()), verbose=0)
        if inception is not None
        else None
    )
    t0 = time.time()
    for k in range(steps):
        idx = order[k]
        g_loss, d_loss, g_adv, g_l1 = step(
            tf.constant(train_src[idx]), tf.constant(train_tgt[idx])
        )
        curves["g_total"].append(float(g_loss))
        curves["d_total"].append(float(d_loss))
        curves["g_adv"].append(float(g_adv))
        curves["g_l1"].append(float(g_l1))
        if (k + 1) % eval_every == 0 or k == 0:
            l1 = float(eval_l1())
            eval_steps.append(k + 1)
            eval_l1s.append(l1)
            print(
                f"step {k+1:5d}: G {float(g_loss):8.4f} D {float(d_loss):7.4f} "
                f"train_l1 {float(g_l1):7.4f} test_l1 {l1:7.4f} "
                f"({time.time()-t0:6.1f}s)",
                flush=True,
            )
        if inception is not None and (k + 1) in fid_at:
            fake = generator_forward(gv, test_src, "tanh").numpy()
            fake_acts = inception.predict(
                ref_regime.fid_preprocess(fake), verbose=0
            )
            fid = ref_regime.reference_fid_from_acts(real_acts, fake_acts)
            fid_steps.append(k + 1)
            fid_values.append(fid)
            print(f"step {k+1:5d}: FID {fid:10.6g} (shared-init features)", flush=True)
    wall = time.time() - t0
    return {
        "framework": f"tensorflow-{tf.__version__} (cpu, reference formulas)",
        "variant": variant,
        "steps": steps,
        "batch": ref_regime.BATCH,
        "dropout": "off (comparability regime, see scripts/ref_regime.py)",
        "wall_seconds": wall,
        "curves": curves,
        "g_total_window_means": ref_regime.window_means(curves["g_total"]),
        "d_total_window_means": ref_regime.window_means(curves["d_total"]),
        "g_l1_window_means": ref_regime.window_means(curves["g_l1"]),
        "eval_steps": eval_steps,
        "eval_l1": eval_l1s,
        "fid_steps": fid_steps,
        "fid": fid_values,
        "fid_features": "shared random-init InceptionV3 "
        "(scripts/make_shared_inception.py)" if fid_steps else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="baseline-no-aug")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--fid-at", default="", help="comma list of FID steps")
    ap.add_argument("--inception-h5", default=ref_regime.SHARED_INCEPTION_H5)
    ap.add_argument("--out", default="reference_train_tf.json")
    args = ap.parse_args()
    result = train(
        args.variant,
        args.steps,
        args.eval_every,
        fid_at=ref_regime.parse_fid_at(args.fid_at),
        inception_h5=args.inception_h5,
    )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}: final test L1 {result['eval_l1'][-1]:.4f}")


if __name__ == "__main__":
    main()
