"""A/B the histogram implementations on hardware.

Times, at batch 1024 bf16 (the train-step operating point):
  - XLA fwd (ops/histogram.py)
  - XLA fwd+bwd through the fused VJP
  - Pallas v1 fwd (histogram_pallas.py, f32 (HW, size) layout)
  - Pallas v2 fwd (histogram_pallas2.py, bf16 (size, HW) layout)
plus value parity of each against the XLA f32 path.

Usage: python scripts/bench_hist_impls.py [--batch 1024]
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


def marginal_time(fn, args, n_long=24, n_short=6, repeats=3):
    """Shared forced-fetch marginal clock (utils/profiling.py)."""
    return marginal_call_seconds(fn, args, n_long, n_short, repeats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    args = p.parse_args()

    from palette_and_histo_gan_tpu.ops import histogram as H
    from palette_and_histo_gan_tpu.ops.histogram_pallas import (
        calculate_rgbuv_histogram_pallas,
    )
    from palette_and_histo_gan_tpu.ops.histogram_pallas2 import (
        calculate_rgbuv_histogram_pallas2,
    )

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (args.batch, 64, 64, 4)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(-1, 1, (args.batch, 64, 64, 4)), jnp.float32)

    xla_bf16 = jax.jit(lambda x: H.calculate_rgbuv_histogram(x, dtype=jnp.bfloat16))
    xla_f32 = jax.jit(lambda x: H.calculate_rgbuv_histogram(x, dtype=jnp.float32))
    v1 = jax.jit(calculate_rgbuv_histogram_pallas)
    v2 = jax.jit(calculate_rgbuv_histogram_pallas2)

    def loss_fn(x):
        h = H.calculate_rgbuv_histogram(x, dtype=jnp.bfloat16)
        ht = H.calculate_rgbuv_histogram(tgt, dtype=jnp.bfloat16)
        return H.hellinger_loss(ht, h)

    grad_bf16 = jax.jit(jax.grad(loss_fn))

    ref = np.asarray(xla_f32(img))
    out = {}
    for name, fn in [
        ("xla_fwd_bf16", xla_bf16),
        ("pallas_v1_fwd", v1),
        ("pallas_v2_fwd", v2),
    ]:
        try:
            got = np.asarray(fn(img))
            err = float(np.abs(got - ref).max() / np.abs(ref).max())
            ms = marginal_time(fn, (img,)) * 1e3
            out[name] = {"ms": round(ms, 3), "max_rel_err": round(err, 5)}
        except Exception as e:
            out[name] = {"error": str(e)[:160]}
    def loss_v2(x):
        h = calculate_rgbuv_histogram_pallas2(x, dtype=jnp.bfloat16)
        ht = calculate_rgbuv_histogram_pallas2(tgt, dtype=jnp.bfloat16)
        return H.hellinger_loss(ht, h)

    grad_v2 = jax.jit(jax.grad(loss_v2))

    def make_loss(bwd):
        def loss(x):
            h = H.calculate_rgbuv_histogram(x, dtype=jnp.bfloat16, bwd=bwd)
            ht = H.calculate_rgbuv_histogram(tgt, dtype=jnp.bfloat16, bwd=bwd)
            return H.hellinger_loss(ht, h)

        return loss

    grad_dual = jax.jit(jax.grad(make_loss("dual")))
    grad_tri2 = jax.jit(jax.grad(make_loss("tri2")))
    grad_tri2b = jax.jit(jax.grad(make_loss("tri2b")))
    grad_tri2c = jax.jit(jax.grad(make_loss("tri2c")))
    grad_pallas3 = jax.jit(jax.grad(make_loss("pallas")))

    ref_g = None
    ref_name = None
    for name, fn in [
        ("xla_fwd_bwd_bf16", grad_bf16),
        ("xla_fwd_bwd_bf16_dual", grad_dual),
        ("xla_fwd_bwd_bf16_tri2", grad_tri2),
        ("xla_fwd_bwd_bf16_tri2b", grad_tri2b),
        ("xla_fwd_bwd_bf16_tri2c", grad_tri2c),
        ("xla_fwd_pallas3_bwd_bf16", grad_pallas3),
        ("pallas_v2_fwd_bwd", grad_v2),
    ]:
        try:
            got = np.asarray(fn(img))
            if ref_g is None:
                # the parity reference is whichever impl ran first; name it
                # in the key so a compile failure of the intended baseline
                # can't silently relabel what the errors are measured against
                ref_g, ref_name = got, name
            gerr = float(np.abs(got - ref_g).max() / (np.abs(ref_g).max() + 1e-12))
            ms = marginal_time(fn, (img,)) * 1e3
            out[name] = {
                "ms": round(ms, 3),
                f"max_rel_err_vs_{ref_name}": round(gerr, 5),
            }
        except Exception as e:
            out[name] = {"error": str(e)[:160]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
