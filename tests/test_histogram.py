import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palette_and_histo_gan_tpu.ops import histogram as hist_ops


def _numpy_rgbuv_histogram(batch, size=64, method="inverse-quadratic", sigma=0.02):
    """Independent numpy re-derivation of the HistoGAN RGB-uv histogram,
    structured differently (per-image loops) from the JAX implementation.
    float32 throughout, like the reference TF implementation."""
    eps = np.float32(1e-6)
    domain = np.linspace(-3.0, 3.0, size, dtype=np.float32)
    batch = np.asarray(batch, np.float32) * 0.5 + 0.5
    batch = batch[..., :3]
    sigma_sqr = np.float32(sigma) ** 2
    out = np.zeros((batch.shape[0], size, size, 3), np.float32)
    for n, img in enumerate(batch):
        flat = img.reshape(-1, 3)
        iy = np.sqrt((flat**2).sum(-1) + eps)
        for ch, (c, p1, p2) in enumerate([(0, 1, 2), (1, 0, 2), (2, 0, 1)]):
            iu = np.log(flat[:, c] + eps) - np.log(flat[:, p1] + eps)
            iv = np.log(flat[:, c] + eps) - np.log(flat[:, p2] + eps)
            du = (iu[:, None] - domain[None, :]) ** 2 / sigma_sqr
            dv = (iv[:, None] - domain[None, :]) ** 2 / sigma_sqr
            if method == "RBF":
                ku, kv = np.exp(-du), np.exp(-dv)
            else:
                ku, kv = 1.0 / (1.0 + du), 1.0 / (1.0 + dv)
            out[n, :, :, ch] = (iy[:, None] * ku).T @ kv
        out[n] /= out[n].sum()
    return out


@pytest.mark.parametrize("method", ["inverse-quadratic", "RBF"])
def test_histogram_matches_numpy(method):
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 4)), jnp.float32)
    ours = hist_ops.calculate_rgbuv_histogram(batch, size=16, method=method)
    ref = _numpy_rgbuv_histogram(batch, size=16, method=method)
    # float32 evaluation-order differences show up on near-zero bins; the
    # scale-aware bound still catches any structural bug (channel swap,
    # transposition), which would shift large bins by O(1) relative error.
    np.testing.assert_allclose(ours, ref, rtol=5e-2, atol=1e-3)
    assert float(np.abs(ours - ref).max()) < 2e-3


def test_histogram_normalized_and_shape():
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.uniform(-1, 1, (3, 16, 16, 4)), jnp.float32)
    h = hist_ops.calculate_rgbuv_histogram(batch)
    assert h.shape == (3, 64, 64, 3)
    # the reference normalizes each batch element by its own total
    np.testing.assert_allclose(jnp.sum(h, axis=(1, 2, 3)), np.ones(3), rtol=1e-5)
    assert jnp.all(h >= 0)


def test_histogram_differentiable():
    rng = np.random.default_rng(2)
    batch = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 8, 8, 4)), jnp.float32)

    def loss(x):
        return jnp.sum(hist_ops.calculate_rgbuv_histogram(x, size=16) ** 2)

    g = jax.grad(loss)(batch)
    assert jnp.all(jnp.isfinite(g))
    assert float(jnp.max(jnp.abs(g[..., :3]))) > 0  # RGB gets gradient
    np.testing.assert_allclose(g[..., 3], 0.0)  # alpha is dropped


def test_hellinger_loss():
    rng = np.random.default_rng(3)
    a = rng.random((4, 8, 8, 3)).astype(np.float32)
    a /= a.sum((1, 2, 3), keepdims=True)
    b = rng.random((4, 8, 8, 3)).astype(np.float32)
    b /= b.sum((1, 2, 3), keepdims=True)
    ours = hist_ops.hellinger_loss(jnp.asarray(a), jnp.asarray(b))
    expected = (1 / np.sqrt(2) * np.sqrt(((np.sqrt(b) - np.sqrt(a)) ** 2).sum())) / 4
    np.testing.assert_allclose(ours, expected, rtol=1e-5)
    # identical histograms -> zero
    np.testing.assert_allclose(
        hist_ops.hellinger_loss(jnp.asarray(a), jnp.asarray(a)), 0.0, atol=1e-6
    )


def test_l1_l2():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([2.0, 2.0, 1.0])
    np.testing.assert_allclose(hist_ops.l1_loss(a, b), 1.0)
    np.testing.assert_allclose(hist_ops.l2_loss(a, b), 5.0 / 3.0)


def test_histogram_jit_compiles():
    batch = jnp.zeros((2, 64, 64, 4), jnp.float32)
    fn = jax.jit(hist_ops.calculate_rgbuv_histogram)
    h = fn(batch)
    assert h.shape == (2, 64, 64, 3)


@pytest.mark.parametrize("bwd", ["tri", "dual", "tri2", "tri2b", "tri2c"])
def test_bwd_variants_match_autodiff(bwd):
    """Every selectable non-Pallas backward dot structure (tri / dual /
    tri2 / tri2b / tri2c) computes the same gradient as plain autodiff;
    they differ only in how many cotangent dots XLA sees and who consumes
    them (see _histogram_core{,_dual,_tri2} docstrings). The "pallas"
    entry is covered by tests/test_histogram_pallas.py."""
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 4)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 4)), jnp.float32)

    def loss(x, fused):
        kw = dict(size=16, dtype=jnp.float32, fused_vjp=fused)
        if fused:
            kw["bwd"] = bwd
        h = hist_ops.calculate_rgbuv_histogram(x, **kw)
        ht = hist_ops.calculate_rgbuv_histogram(tgt, **kw)
        return hist_ops.hellinger_loss(ht, h)

    assert float(loss(img, True)) == float(loss(img, False))
    g_v = jax.grad(lambda x: loss(x, True))(img)
    g_auto = jax.grad(lambda x: loss(x, False))(img)
    scale = float(jnp.abs(g_auto).max())
    np.testing.assert_allclose(
        np.asarray(g_v), np.asarray(g_auto), atol=1e-5 * scale
    )


@pytest.mark.parametrize("method", ["inverse-quadratic", "RBF"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_vjp_matches_autodiff(method, dtype):
    """The hand-structured backward of _histogram_core (one reduce consumer
    per cotangent dot, so XLA can output-fuse instead of materializing the
    (B, HW, size) intermediates) must equal plain autodiff of the same
    forward. Forward values are the identical code path; gradients agree to
    reduction-order rounding."""
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 4)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 4)), jnp.float32)

    def loss(x, fused):
        h = hist_ops.calculate_rgbuv_histogram(
            x, size=16, method=method, dtype=dtype, fused_vjp=fused
        )
        ht = hist_ops.calculate_rgbuv_histogram(
            tgt, size=16, method=method, dtype=dtype, fused_vjp=fused
        )
        return hist_ops.hellinger_loss(ht, h)

    assert float(loss(img, True)) == float(loss(img, False))
    g_fused = jax.grad(lambda x: loss(x, True))(img)
    g_auto = jax.grad(lambda x: loss(x, False))(img)
    # RBF saturates exp(-d^2/sigma^2) to exactly 0 for most bins; identical
    # zero-histogram cells then hit sqrt'(0) = inf in the Hellinger loss in
    # BOTH paths (reference behavior) — compare where finite
    finite = jnp.isfinite(g_auto) & jnp.isfinite(g_fused)
    assert bool(jnp.all(jnp.isfinite(g_auto) == jnp.isfinite(g_fused)))
    ga = jnp.where(finite, g_auto, 0.0)
    gf = jnp.where(finite, g_fused, 0.0)
    scale = float(jnp.abs(ga).max())
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(gf), np.asarray(ga), atol=tol * scale)
    # alpha never contributes
    assert float(jnp.abs(g_fused[..., 3]).max()) == 0.0
