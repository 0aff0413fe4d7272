"""Component-level decomposition of the train step on real hardware.

Times each sub-computation of the flagship step in isolation with the same
marginal-rate protocol as bench.py (forced host fetch; tunnel-safe), so the
optimization frontier is measured, not guessed:

  - generator forward (dropout on / off)
  - generator forward+backward
  - discriminator forward / forward+backward
  - both histograms + Hellinger forward+backward
  - batched augmentation
  - Adam updates alone
  - alternative transpose_impl for the generator

Usage:
    python scripts/profile_components.py [--batch 1024] [--dtype bfloat16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


from palette_and_histo_gan_tpu.utils.profiling import marginal_call_seconds


def marginal_time(fn, args, n_long=16, n_short=4, repeats=3):
    """Shared forced-fetch marginal clock (utils/profiling.py)."""
    return marginal_call_seconds(fn, args, n_long, n_short, repeats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--out", default="/tmp/profile_components.json")
    args = p.parse_args()

    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.ops import augment as aug_ops
    from palette_and_histo_gan_tpu.ops import histogram as hist_ops
    from palette_and_histo_gan_tpu.train.state import build_models, create_train_state

    b = args.batch
    config = config_for_variant(
        "histogram", compute_dtype=args.dtype, batch_size=b, donate_state=False
    )
    models = build_models(config)
    state = create_train_state(config, models, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 4)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 4)), jnp.float32)
    raw = jnp.asarray(rng.uniform(0, 255, (b, 64, 64, 4)), jnp.float32)
    key = jax.random.PRNGKey(1)
    results = {}

    def report(name, seconds):
        results[name] = seconds
        print(json.dumps({"component": name, "ms": round(seconds * 1e3, 2)}))

    gen, disc = models.generator, models.discriminator

    # generator forward, dropout on (as trained) and off
    g_fwd = jax.jit(
        lambda p, s, k: gen.apply(
            {"params": p}, s, deterministic=False, rngs={"dropout": k}
        ).sum()
    )
    report("g_fwd_dropout", marginal_time(g_fwd, (state.g_params, src, key)))
    g_fwd_det = jax.jit(
        lambda p, s: gen.apply({"params": p}, s, deterministic=True).sum()
    )
    report("g_fwd_no_dropout", marginal_time(g_fwd_det, (state.g_params, src)))

    # generator forward+backward (params grad)
    g_fb = jax.jit(
        jax.grad(
            lambda p, s, k: gen.apply(
                {"params": p}, s, deterministic=False, rngs={"dropout": k}
            ).sum()
        )
    )
    report("g_fwd_bwd", marginal_time(g_fb, (state.g_params, src, key)))

    # alternative transposed-conv lowering
    alt = "subpixel" if config.transpose_impl == "lax" else "lax"
    gen_alt = gen.clone(transpose_impl=alt)
    p_alt = gen_alt.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, src[:1]
    )["params"]
    g_fb_alt = jax.jit(
        jax.grad(
            lambda p, s, k: gen_alt.apply(
                {"params": p}, s, deterministic=False, rngs={"dropout": k}
            ).sum()
        )
    )
    report(f"g_fwd_bwd_{alt}", marginal_time(g_fb_alt, (p_alt, src, key)))

    # discriminator
    d_fwd = jax.jit(lambda p, t, s: disc.apply({"params": p}, t, s).sum())
    report("d_fwd", marginal_time(d_fwd, (state.d_params, tgt, src)))
    d_fb = jax.jit(
        jax.grad(lambda p, t, s: disc.apply({"params": p}, t, s).sum())
    )
    report("d_fwd_bwd", marginal_time(d_fb, (state.d_params, tgt, src)))

    # histogram chain: both histograms + Hellinger, fwd+bwd w.r.t. fake
    hd = jnp.dtype(config.compute_dtype)

    def hist_loss(fake, real):
        hf = hist_ops.calculate_rgbuv_histogram(fake, dtype=hd)
        hr = hist_ops.calculate_rgbuv_histogram(real, dtype=hd)
        return hist_ops.hellinger_loss(hr, hf)

    h_fb = jax.jit(jax.grad(hist_loss))
    report("hist_fwd_bwd", marginal_time(h_fb, (src, tgt)))

    # augmentation
    a_fn = jax.jit(lambda s, t, k: aug_ops.augment_batch(s, t, k))
    report("augment", marginal_time(a_fn, (raw, raw, key)))

    # Adam updates alone (both optimizers)
    def adam_only(st, gg, dg):
        g_up, g_os = models.g_tx.update(gg, st.g_opt_state, st.g_params)
        d_up, d_os = models.d_tx.update(dg, st.d_opt_state, st.d_params)
        import optax

        return (
            optax.apply_updates(st.g_params, g_up),
            optax.apply_updates(st.d_params, d_up),
        )

    zeros_g = jax.tree.map(jnp.zeros_like, state.g_params)
    zeros_d = jax.tree.map(jnp.zeros_like, state.d_params)
    adam_fn = jax.jit(adam_only)
    report("adam_updates", marginal_time(adam_fn, (state, zeros_g, zeros_d)))

    with open(args.out, "w") as f:
        json.dump({"batch": b, "dtype": args.dtype, "seconds": results}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
