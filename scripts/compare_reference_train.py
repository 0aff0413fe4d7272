"""The build's side of the measured training-quality comparison.

Runs the PRODUCTION train-step path (train.steps.make_train_step) under the
identical regime as scripts/reference_train_tf.py — same reference-faithful
initial weights, same real-sprite batch order, dropout off, same test-L1
eval protocol (scripts/ref_regime.py) — then compares the two trajectories:
per-window mean losses and the test-L1 curve. Writes build_train_jax.json
and prints the comparison table that BASELINE.md records.

The microscopic trajectories decorrelate chaotically after a few steps
(near-sign Adam updates amplify f32 noise; measured in
tests/test_parity.py::TestTrajectoryParity's calibration), so the
comparison is macroscopic: windowed loss means and eval-L1 levels. The
TIGHT per-step proof lives in the trajectory parity fixtures; this script
answers the different question "does the build TRAIN to the same quality
on the same schedule?".

Ref: /root/reference/side2side_model.py:67-122.

Run from the repo root (TPU or CPU; the default backend is used):
  python scripts/compare_reference_train.py --steps 1000 \
      --reference reference_train_tf.json --out build_train_jax.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

import ref_regime
from ref_regime import pu  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def train_indexed(steps: int, eval_every: int) -> dict:
    """The indexed family through the production step path; eval protocol
    identical to scripts/reference_train_tf.py::train_indexed (L1 on
    palette-decoded [0,255] images, shared decode in ref_regime)."""
    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.models import convert
    from palette_and_histo_gan_tpu.train.state import TrainState, build_models
    from palette_and_histo_gan_tpu.train.steps import make_train_step

    config = config_for_variant(
        "indexed", deterministic_dropout=True, donate_state=False
    )
    models = build_models(config)
    gp = jax.tree_util.tree_map(
        jnp.asarray,
        convert.generator_tree_from_named(
            ref_regime.reference_init(pu.generator_param_spec(1, 256))
        ),
    )
    dp = jax.tree_util.tree_map(
        jnp.asarray,
        convert.discriminator_tree_from_named(
            ref_regime.reference_init(pu.discriminator_param_spec(1))
        ),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=gp,
        d_params=dp,
        g_opt_state=models.g_tx.init(gp),
        d_opt_state=models.d_tx.init(dp),
        rng=jax.random.PRNGKey(0),
    )
    step_fn = make_train_step(config, models)

    (tr_src, tr_tgt, _), (te_src, te_tgt, te_pal) = ref_regime.load_indexed_splits()
    order = ref_regime.batch_order(len(tr_src), steps)
    test_src_f = jnp.asarray(te_src.astype(np.float32))
    decoded_real = ref_regime.decode_indexed(te_tgt, te_pal)

    logits_gen = models.generator.clone(last_activation="linear")

    @jax.jit
    def test_fake_idx(g_params):
        logits = logits_gen.apply({"params": g_params}, test_src_f, deterministic=True)
        return jnp.argmax(logits, axis=-1)[..., None].astype(jnp.int32)

    curves = {"g_total": [], "d_total": [], "g_adv": [], "segmentation": []}
    eval_steps, eval_l1s = [], []
    t0 = time.time()
    for k in range(steps):
        idx = order[k]
        state, metrics = step_fn(
            state,
            jnp.asarray(tr_src[idx], jnp.int32),
            jnp.asarray(tr_tgt[idx], jnp.int32),
        )
        curves["g_total"].append(float(metrics["generator/total_loss"]))
        curves["d_total"].append(float(metrics["discriminator/total_loss"]))
        curves["g_adv"].append(float(metrics["generator/adversarial_loss"]))
        curves["segmentation"].append(
            float(metrics["generator/segmentation_loss"])
        )
        if (k + 1) % eval_every == 0 or k == 0:
            decoded_fake = ref_regime.decode_indexed(
                np.asarray(test_fake_idx(state.g_params)), te_pal
            )
            l1 = float(np.abs(decoded_real - decoded_fake).mean())
            eval_steps.append(k + 1)
            eval_l1s.append(l1)
            print(
                f"step {k+1:5d}: G {curves['g_total'][-1]:8.4f} "
                f"D {curves['d_total'][-1]:7.4f} "
                f"seg {curves['segmentation'][-1]:7.4f} test_l1 {l1:8.4f} "
                f"({time.time()-t0:6.1f}s)",
                flush=True,
            )
    wall = time.time() - t0
    return {
        "framework": f"jax-{jax.__version__} ({jax.default_backend()}, "
        "production step path)",
        "variant": "indexed",
        "steps": steps,
        "batch": ref_regime.BATCH,
        "dropout": "off (comparability regime, see scripts/ref_regime.py)",
        "wall_seconds": wall,
        "curves": curves,
        "g_total_window_means": ref_regime.window_means(curves["g_total"]),
        "d_total_window_means": ref_regime.window_means(curves["d_total"]),
        "segmentation_window_means": ref_regime.window_means(
            curves["segmentation"]
        ),
        "eval_steps": eval_steps,
        "eval_l1": eval_l1s,
    }


def train(variant: str, steps: int, eval_every: int, fid_at=()) -> dict:
    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.models import convert
    from palette_and_histo_gan_tpu.train.state import TrainState, build_models
    from palette_and_histo_gan_tpu.train.steps import make_train_step

    if variant == "indexed":
        return train_indexed(steps, eval_every)

    config = config_for_variant(
        variant,
        deterministic_dropout=True,  # the comparability regime
        donate_state=False,
        augment_probability=0.0,  # histogram variant: exact pass-through
    )
    models = build_models(config)

    gp = jax.tree_util.tree_map(
        jnp.asarray,
        convert.generator_tree_from_named(
            ref_regime.reference_init(pu.generator_param_spec(4, 4))
        ),
    )
    dp = jax.tree_util.tree_map(
        jnp.asarray,
        convert.discriminator_tree_from_named(
            ref_regime.reference_init(pu.discriminator_param_spec(4))
        ),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=gp,
        d_params=dp,
        g_opt_state=models.g_tx.init(gp),
        d_opt_state=models.d_tx.init(dp),
        rng=jax.random.PRNGKey(0),  # consumed only by disabled aug/dropout
    )
    step_fn = make_train_step(config, models)

    train_src_u8, train_tgt_u8, test_src_u8, test_tgt_u8 = ref_regime.load_splits()
    order = ref_regime.batch_order(len(train_src_u8), steps)
    test_src = jnp.asarray(ref_regime.normalize(test_src_u8))
    test_tgt = jnp.asarray(ref_regime.normalize(test_tgt_u8))

    @jax.jit
    def eval_l1(g_params):
        fake = models.generator.apply(
            {"params": g_params}, test_src, deterministic=True
        )
        return jnp.mean(jnp.abs(test_tgt - fake))

    @jax.jit
    def eval_fake(g_params):
        return models.generator.apply(
            {"params": g_params}, test_src, deterministic=True
        )

    fid_eval = None
    if fid_at:
        from palette_and_histo_gan_tpu.eval.fid import FidEvaluator

        # PHG_INCEPTION_WEIGHTS (set in main) points at the shared-init
        # npz scripts/make_shared_inception.py wrote — the SAME extractor
        # the TF side loads as .weights.h5, so FIDs are comparable.
        fid_eval = FidEvaluator(batch_size=44, reference_quirks=True)
        real_acts = np.asarray(fid_eval.activations(np.asarray(test_tgt)))

    # Per-step host fetches cost a tunnel RTT each (~29 ms; measured
    # 1.3 s/step wall in the round-4 runs) — buffer the device-scalar
    # metric dicts and fetch a whole window per eval instead.
    curves = {"g_total": [], "d_total": [], "g_adv": [], "g_l1": []}
    pending = []

    def flush():
        for m in jax.device_get(pending):
            curves["g_total"].append(float(m["generator/total_loss"]))
            curves["d_total"].append(float(m["discriminator/total_loss"]))
            curves["g_adv"].append(float(m["generator/adversarial_loss"]))
            curves["g_l1"].append(float(m["generator/l1_loss"]))
        pending.clear()

    eval_steps, eval_l1s = [], []
    fid_steps, fid_values, fid_values_lowrank = [], [], []
    t0 = time.time()
    for k in range(steps):
        idx = order[k]
        state, metrics = step_fn(
            state, jnp.asarray(train_src_u8[idx]), jnp.asarray(train_tgt_u8[idx])
        )
        pending.append(metrics)
        if (k + 1) % eval_every == 0 or k == 0:
            flush()
            l1 = float(eval_l1(state.g_params))
            eval_steps.append(k + 1)
            eval_l1s.append(l1)
            print(
                f"step {k+1:5d}: G {curves['g_total'][-1]:8.4f} "
                f"D {curves['d_total'][-1]:7.4f} "
                f"train_l1 {curves['g_l1'][-1]:7.4f} test_l1 {l1:7.4f} "
                f"({time.time()-t0:6.1f}s)",
                flush=True,
            )
        if fid_eval is not None and (k + 1) in fid_at:
            fake_acts = np.asarray(
                fid_eval.activations(np.asarray(eval_fake(state.g_params)))
            )
            # scipy = the reference's exact CPU formula (comparable
            # apples-to-apples with the TF side); lowrank = the build's
            # production on-device path (exact for sample covariances)
            fid = ref_regime.reference_fid_from_acts(real_acts, fake_acts)
            fid_lr = float(
                fid_eval._distance_lowrank(
                    jnp.asarray(real_acts), jnp.asarray(fake_acts)
                )
            )
            fid_steps.append(k + 1)
            fid_values.append(fid)
            fid_values_lowrank.append(fid_lr)
            print(
                f"step {k+1:5d}: FID {fid:10.6g} (scipy) {fid_lr:10.6g} "
                "(lowrank, production)",
                flush=True,
            )
    flush()
    wall = time.time() - t0
    return {
        "framework": f"jax-{jax.__version__} ({jax.default_backend()}, "
        "production step path)",
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
        "fid_lowrank": fid_values_lowrank,
        "fid_features": "shared random-init InceptionV3 "
        "(scripts/make_shared_inception.py)" if fid_steps else None,
    }


def compare(build: dict, ref: dict) -> None:
    print("\n=== build (JAX, production path) vs reference (TF, measured) ===")
    for key, label in (
        ("g_total_window_means", "G loss"),
        ("d_total_window_means", "D loss"),
        ("g_l1_window_means", "train L1"),
        ("segmentation_window_means", "seg CE"),
    ):
        if key not in build or key not in ref:
            continue
        b, r = build[key], ref[key]
        print(f"{label:9s} windows:")
        for i, (bv, rv) in enumerate(zip(b, r)):
            rel = abs(bv - rv) / max(abs(rv), 1e-9)
            print(
                f"  w{i}: build {bv:9.4f}  ref {rv:9.4f}  rel {rel:6.1%}"
            )
    b, r = build["eval_l1"], ref["eval_l1"]
    print("test L1 curve:")
    for s, bv, rv in zip(build["eval_steps"], b, r):
        rel = abs(bv - rv) / max(abs(rv), 1e-9)
        print(f"  step {s:5d}: build {bv:7.4f}  ref {rv:7.4f}  rel {rel:6.1%}")
    if build.get("fid") and ref.get("fid"):
        print("FID curve (shared-init InceptionV3 features):")
        for s, bv, rv in zip(build["fid_steps"], build["fid"], ref["fid"]):
            rel = abs(bv - rv) / max(abs(rv), 1e-9)
            print(
                f"  step {s:5d}: build {bv:10.6g}  ref {rv:10.6g}  rel {rel:6.1%}"
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="baseline-no-aug")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--fid-at", default="", help="comma list of FID steps")
    ap.add_argument("--inception-npz", default=ref_regime.SHARED_INCEPTION_NPZ)
    ap.add_argument("--reference", default="reference_train_tf.json")
    ap.add_argument("--out", default="build_train_jax.json")
    args = ap.parse_args()
    fid_at = ref_regime.parse_fid_at(args.fid_at)
    if fid_at:
        os.environ["PHG_INCEPTION_WEIGHTS"] = os.path.abspath(args.inception_npz)
    result = train(args.variant, args.steps, args.eval_every, fid_at=fid_at)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}: final test L1 {result['eval_l1'][-1]:.4f}")
    if os.path.exists(args.reference):
        with open(args.reference) as f:
            ref = json.load(f)
        if ref["variant"] == result["variant"] and ref["steps"] == result["steps"]:
            compare(result, ref)
        else:
            print("reference JSON is for a different regime; not comparing")


if __name__ == "__main__":
    main()
