"""Generate N-step closed-loop training-trajectory parity fixtures with TF.

Runs N_STEPS *full* reference train steps — G forward -> both losses ->
both tape gradients -> both keras-Adam applies (pix2pix_model.py:62-89),
with G and D CO-EVOLVING: step k+1's generator sees the discriminator that
step k updated, real gradients flow into real optimizer moments, and the
InstanceNorm statistics shift with the updated params — for the three loss
families:

  - rgba baseline (lambda_l1=100, pix2pix_model.py:44-56), on real vendored
    sprite batches (front -> right, the reference's default pair);
  - histogram (lambda_l1=30 + Hellinger over the rgb-uv histograms,
    pix2pix_model.py:242-250, TF autodiff through the reference's own
    TF-ops histogram graph), same real batches;
  - indexed (0.01 * CCE; the adversarial term is argmax-blocked,
    pix2pix_model.py:273-309), on deterministic synthetic index maps.

Dropout is off on both sides (the fixtures' convention — its RNG cannot be
matched across frameworks); weights regenerate deterministically from
canonical names (tests/parity_utils.py) so the fixture stores only batch
indices / index maps, the per-step loss scalars, and the end-state
per-variable parameter-DELTA pins (norm + full-for-small + random
projections, pu.grad_fixture_arrays).

This is the composition proof the single-step fixtures
(make_golden_networks.py) cannot give: a small structured error in any
link (forward, VJP, optimizer) compounds across steps into visible
loss/delta drift here. The matching test drives the PRODUCTION step path
(train.steps.make_train_step with config.deterministic_dropout=True) —
tests/test_parity.py::TestTrajectoryParity.

Run from the repo root:  python scripts/make_golden_trajectory.py
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

from palette_and_histo_gan_tpu.config import (  # noqa: E402
    DIRECTION_FRONT,
    DIRECTION_RIGHT,
    TRAIN_SIZE,
    default_data_root,
)
from palette_and_histo_gan_tpu.data.loader import load_split_arrays  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)

N_STEPS = 6
BATCH = 4
# Parameter deltas are ALSO snapshotted after this many steps and pinned
# tightly. Measured (2026-08-20, TF 2.21 vs the production JAX path): by
# step 6 the co-evolving trajectories diverge chaotically — near-sign Adam
# updates amplify f32 accumulation noise until elementwise deltas differ by
# up to ~0.9x their scale (histogram family) even though every per-step
# LOSS still matches to ~1e-4 — so the end-state deltas can only pin gross
# structure, while the step-2 deltas (one real moment-mixing update past
# t=1) stay tight.
N_TIGHT = 2


def save(name, **arrays):
    np.savez(os.path.join(OUT, name + ".npz"), **arrays)
    total = sum(np.asarray(a).nbytes for a in arrays.values())
    print(f"wrote {name}.npz ({total/1e6:.2f} MB): {len(arrays)} keys")


def trajectory_batch_indices() -> np.ndarray:
    """(N_STEPS, BATCH) deterministic train-split indices, regenerated
    identically by the test. Independent uniform draws (not the production
    epoch-permutation sampler) — the point is fixed batches both sides
    agree on, not the sampler, which has its own tests."""
    rng = np.random.default_rng(pu.zlib.crc32(b"trajectory/rgba/batches"))
    return rng.integers(0, TRAIN_SIZE, size=(N_STEPS, BATCH)).astype(np.int32)


def trajectory_index_maps(name: str) -> np.ndarray:
    """(N_STEPS, BATCH, 64, 64, 1) uint8 synthetic palette-index maps."""
    rng = np.random.default_rng(pu.zlib.crc32(name.encode("utf-8")))
    return rng.integers(
        0, 256, size=(N_STEPS, BATCH, 64, 64, 1), dtype=np.uint8
    )


def adam():
    # keras Adam(2e-4, beta_1=0.5), eps default 1e-7 (pix2pix_model.py:28-29)
    return tf.keras.optimizers.Adam(learning_rate=2e-4, beta_1=0.5)


def apply(opt, grads: dict, variables: dict):
    names = sorted(variables)
    opt.apply_gradients(
        zip([grads[k] for k in names], [variables[k] for k in names])
    )


def run_rgba_family(wg, wd, src_batches, tgt_batches, lambda_l1, use_hist):
    """N_STEPS co-evolving reference train steps (pix2pix_model.py:62-89).

    src/tgt_batches: (N_STEPS, B, 64, 64, 4) float32 already normalized to
    [-1, 1]. Returns per-step loss curves + end-state param deltas."""
    gv = {k: tf.Variable(v) for k, v in wg.items()}
    dv = {k: tf.Variable(v) for k, v in wd.items()}
    g_opt, d_opt = adam(), adam()
    curves = {k: [] for k in ("g_total", "d_total", "g_adv", "g_l1", "hellinger")}
    tight = None
    for step in range(N_STEPS):
        src = tf.constant(src_batches[step])
        tgt = tf.constant(tgt_batches[step])
        with tf.GradientTape(persistent=True) as tape:
            fake = generator_forward(gv, src, "tanh")
            d_real = discriminator_forward(dv, tgt, src)
            d_fake = discriminator_forward(dv, fake, src)
            g_adv = bce(tf.ones_like(d_fake), d_fake)
            g_l1 = tf.reduce_mean(tf.abs(tgt - fake))
            g_loss = g_adv + lambda_l1 * g_l1  # pix2pix_model.py:44-49
            if use_hist:  # pix2pix_model.py:242-250
                hell = tf_hellinger(
                    tf_rgbuv_histogram(tgt), tf_rgbuv_histogram(fake)
                )
                g_loss = g_loss + 1.0 * hell
            d_loss = bce(tf.ones_like(d_real), d_real) + bce(
                tf.zeros_like(d_fake), d_fake
            )  # pix2pix_model.py:51-56
        g_grads = tape.gradient(g_loss, gv)
        d_grads = tape.gradient(d_loss, dv)
        del tape
        apply(g_opt, g_grads, gv)
        apply(d_opt, d_grads, dv)
        curves["g_total"].append(float(g_loss))
        curves["d_total"].append(float(d_loss))
        curves["g_adv"].append(float(g_adv))
        curves["g_l1"].append(float(g_l1))
        curves["hellinger"].append(float(hell) if use_hist else 0.0)
        print(
            f"  step {step}: G {float(g_loss):.6f}  D {float(d_loss):.6f}"
        )
        if step + 1 == N_TIGHT:
            tight = (
                {k: gv[k].numpy() - wg[k] for k in wg},
                {k: dv[k].numpy() - wd[k] for k in wd},
            )
    deltas_g = {k: gv[k].numpy() - wg[k] for k in wg}
    deltas_d = {k: dv[k].numpy() - wd[k] for k in wd}
    return curves, tight, deltas_g, deltas_d


def run_indexed_family(wg, wd, src_maps, tgt_maps):
    """N_STEPS co-evolving indexed train steps (pix2pix_model.py:295-325):
    the adversarial term reaches G only through argmax -> int cast, so its
    G-gradient is exactly zero on both sides; G trains on 0.01*CCE alone."""
    gv = {k: tf.Variable(v) for k, v in wg.items()}
    dv = {k: tf.Variable(v) for k, v in wd.items()}
    g_opt, d_opt = adam(), adam()
    curves = {k: [] for k in ("g_total", "d_total", "g_adv", "segmentation")}
    tight = None
    for step in range(N_STEPS):
        src = tf.constant(src_maps[step].astype(np.float32))
        real_idx = tgt_maps[step].astype(np.int32)
        with tf.GradientTape(persistent=True) as tape:
            probs = generator_forward(gv, src, "softmax")
            fake_idx = tf.expand_dims(
                tf.argmax(probs, axis=-1, output_type=tf.int32), -1
            )  # pix2pix_model.py:287
            d_real = discriminator_forward(
                dv, tf.cast(real_idx, tf.float32), src
            )
            d_fake = discriminator_forward(
                dv, tf.cast(fake_idx, tf.float32), src
            )
            one_hot = tf.reshape(
                tf.one_hot(real_idx, 256, axis=-1), [BATCH, 64, 64, -1]
            )  # pix2pix_model.py:300-301
            g_adv = bce(tf.ones_like(d_fake), d_fake)
            seg = cce(one_hot, probs)
            g_loss = g_adv + 0.01 * seg  # lambda_segmentation=0.01
            d_loss = bce(tf.ones_like(d_real), d_real) + bce(
                tf.zeros_like(d_fake), d_fake
            )
        g_grads = tape.gradient(g_loss, gv)
        d_grads = tape.gradient(d_loss, dv)
        del tape
        # argmax-blocked vars get None gradients == zeros (no Adam state
        # change of consequence: keras still applies a zero update; so does
        # the JAX side's zero cotangent)
        g_grads = {
            k: (tf.zeros_like(gv[k]) if g is None else g)
            for k, g in g_grads.items()
        }
        apply(g_opt, g_grads, gv)
        apply(d_opt, d_grads, dv)
        curves["g_total"].append(float(g_loss))
        curves["d_total"].append(float(d_loss))
        curves["g_adv"].append(float(g_adv))
        curves["segmentation"].append(float(seg))
        print(
            f"  step {step}: G {float(g_loss):.6f}  D {float(d_loss):.6f}"
        )
        if step + 1 == N_TIGHT:
            tight = (
                {k: gv[k].numpy() - wg[k] for k in wg},
                {k: dv[k].numpy() - wd[k] for k in wd},
            )
    deltas_g = {k: gv[k].numpy() - wg[k] for k in wg}
    deltas_d = {k: dv[k].numpy() - wd[k] for k in wd}
    return curves, tight, deltas_g, deltas_d


def main():
    # --- real sprite batches for the rgba families ---------------------------
    root = default_data_root()
    src_split = load_split_arrays(root, "train", DIRECTION_FRONT)
    tgt_split = load_split_arrays(root, "train", DIRECTION_RIGHT)
    idx = trajectory_batch_indices()
    # raw [0, 255] -> [-1, 1] (dataset_utils.py:39-48 == ops/image.normalize)
    src_batches = src_split[idx].astype(np.float32) / 127.5 - 1.0
    tgt_batches = tgt_split[idx].astype(np.float32) / 127.5 - 1.0

    wg = pu.materialize(pu.generator_param_spec(4, 4))
    wd = pu.materialize(pu.discriminator_param_spec(4))

    for name, lambda_l1, use_hist in (
        ("trajectory_rgba", 100.0, False),
        ("trajectory_histogram", 30.0, True),
    ):
        print(name)
        curves, (tg, td), dg, dd = run_rgba_family(
            wg, wd, src_batches, tgt_batches, lambda_l1, use_hist
        )
        save(
            name,
            batch_indices=idx,
            **{k: np.asarray(v, np.float64) for k, v in curves.items()},
            **pu.grad_fixture_arrays(tg, "g2."),
            **pu.grad_fixture_arrays(td, "d2."),
            **pu.grad_fixture_arrays(dg, "g."),
            **pu.grad_fixture_arrays(dd, "d."),
        )

    # --- indexed family on synthetic index maps ------------------------------
    src_maps = trajectory_index_maps("trajectory/indexed/source")
    tgt_maps = trajectory_index_maps("trajectory/indexed/target")
    wgi = pu.materialize(pu.generator_param_spec(1, 256))
    wdi = pu.materialize(pu.discriminator_param_spec(1))
    print("trajectory_indexed")
    curves, (tg, td), dg, dd = run_indexed_family(wgi, wdi, src_maps, tgt_maps)
    save(
        "trajectory_indexed",
        **{k: np.asarray(v, np.float64) for k, v in curves.items()},
        **pu.grad_fixture_arrays(tg, "g2."),
        **pu.grad_fixture_arrays(td, "d2."),
        **pu.grad_fixture_arrays(dg, "g."),
        **pu.grad_fixture_arrays(dd, "d."),
    )
    print("done")


if __name__ == "__main__":
    main()
