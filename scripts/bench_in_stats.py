"""Micro-A/B: InstanceNorm statistics pass at the decoder operating points.

The flagship trace shows four convert_reduce fusions (one per visible
UpBlock) computing (mean, mean2) over spatial dims at 3-20x their HBM read
floors, ~3.4 ms/step total. Candidates:
  A. XLA fused reduce (current form: mean + mean(x^2), f32 accumulate)
  B. dot-based reduce: ones(HW) contraction on the MXU
  C. Pallas moments kernel: one DMA pass, both moments in VMEM
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from palette_and_histo_gan_tpu.utils.profiling import marginal_call_seconds


def stats_xla(x):
    mean = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(x), axis=(1, 2), dtype=jnp.float32)
    return mean, mean2


def stats_dot(x):
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    ones = jnp.ones((h * w,), jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    s = jax.lax.dot_general(
        ones, flat, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s2 = jax.lax.dot_general(
        ones, flat * flat, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    n = float(h * w)
    return s / n, s2 / n


def _moments_kernel(x_ref, m_ref, m2_ref, *, block, hw):
    for j in range(block):
        x = x_ref[j].astype(jnp.float32)      # (HW, C) f32
        m_ref[j] = jnp.sum(x, axis=0) * (1.0 / hw)
        m2_ref[j] = jnp.sum(x * x, axis=0) * (1.0 / hw)


def stats_pallas(x, block=8):
    b, h, w, c = x.shape
    hw = h * w
    flat = x.reshape(b, hw, c)
    grid = (b // block,)
    out = jax.ShapeDtypeStruct((b, c), jnp.float32)
    m, m2 = pl.pallas_call(
        functools.partial(_moments_kernel, block=block, hw=hw),
        grid=grid,
        in_specs=[pl.BlockSpec((block, hw, c), lambda i: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0)),
            pl.BlockSpec((block, c), lambda i: (i, 0)),
        ],
        out_shape=(out, out),
        interpret=jax.default_backend() == "cpu",
    )(flat)
    return m, m2


def main():
    shapes = [
        (1024, 8, 8, 256),
        (1024, 16, 16, 128),
        (1024, 32, 32, 64),
        (1024, 64, 64, 32),
    ]
    rng = np.random.default_rng(0)
    for shape in shapes:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        mb = x.size * 2 / 1e6
        floor_ms = x.size * 2 / 819e9 * 1e3
        row = [f"{shape} ({mb:.0f} MB, floor {floor_ms:.3f} ms)"]
        ref = None
        for name, fn in [("xla", stats_xla), ("dot", stats_dot),
                         ("pallas", stats_pallas)]:
            jf = jax.jit(fn)
            try:
                out = jf(x)
                m = np.asarray(out[0], np.float32)
                m2 = np.asarray(out[1], np.float32)
                if ref is None:
                    ref = (m, m2)
                else:
                    err = max(np.abs(m - ref[0]).max(), np.abs(m2 - ref[1]).max())
                    assert err < 1e-2, (name, err)
                t = marginal_call_seconds(jf, (x,), 48, 12, 3)
                row.append(f"{name} {t*1e3:.3f} ms")
            except Exception as e:  # noqa
                row.append(f"{name} FAIL {type(e).__name__}: {str(e)[:120]}")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
