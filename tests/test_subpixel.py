"""SubpixelConvTranspose: exactness vs a direct transposed-conv computation.

A k4 s2 SAME transposed conv partitions its 4x4 kernel into four disjoint
2x2 phase kernels (output phase (ry, rx) has taps in[y-1+ry : y+1+ry,
x-1+rx : x+1+rx]) — so the subpixel module's own phase weights must
reproduce exactly the direct per-phase computation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from palette_and_histo_gan_tpu.models.networks import (
    SubpixelConvTranspose,
    UnetGenerator,
)


def _direct_phase_transposed_conv(x, kernel, c_out):
    """numpy: out[2y+ry, 2x+rx] = sum over (ty, tx) of
    kernel[ty, tx, :, (2ry+rx) block] * in[y-1+ry+ty, x-1+rx+tx]."""
    b, h, w, c_in = x.shape
    out = np.zeros((b, 2 * h, 2 * w, c_out), np.float32)
    xp = np.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    for ry in (0, 1):
        for rx in (0, 1):
            kblock = kernel[:, :, :, (2 * ry + rx) * c_out : (2 * ry + rx + 1) * c_out]
            for y in range(h):
                for xx in range(w):
                    window = xp[:, y + ry : y + ry + 2, xx + rx : xx + rx + 2, :]
                    val = np.einsum("bijc,ijco->bo", window, kblock)
                    out[:, 2 * y + ry, 2 * xx + rx, :] = val
    return out


def test_subpixel_matches_direct_computation():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32)
    mod = SubpixelConvTranspose(filters=5)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = np.asarray(mod.apply(variables, x))
    kernel = np.asarray(jax.tree.leaves(variables["params"])[0])  # (2,2,3,20)
    expected = _direct_phase_transposed_conv(np.asarray(x), kernel, 5)
    assert out.shape == (2, 8, 8, 5)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_subpixel_output_shape_chain():
    # 1x1 -> 64x64 through six doublings, like the generator decoder
    x = jnp.ones((1, 1, 1, 8))
    for _ in range(6):
        mod = SubpixelConvTranspose(filters=8)
        variables = mod.init(jax.random.PRNGKey(0), x)
        x = mod.apply(variables, x)
    assert x.shape == (1, 64, 64, 8)


def test_generator_param_count_unchanged_with_subpixel():
    for impl in ("subpixel", "lax"):
        model = UnetGenerator(transpose_impl=impl)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)), deterministic=True
        )
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
        assert n == 29_307_844, (impl, n)


def test_generator_forward_works_both_impls():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 64, 4)), jnp.float32)
    for impl in ("subpixel", "lax"):
        model = UnetGenerator(
            transpose_impl=impl,
            down_filters=(8,) * 6,
            up_filters=(8,) * 6,
        )
        variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
        y = model.apply(variables, x, deterministic=True)
        assert y.shape == (1, 64, 64, 4)
        assert bool(jnp.all(jnp.isfinite(y)))
