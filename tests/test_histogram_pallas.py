"""Parity tests: fused Pallas histogram vs the plain-JAX implementation.

Run in Pallas interpreter mode on CPU (the kernel targets TPU hardware; the
interpreter executes identical semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from palette_and_histo_gan_tpu.ops import histogram as hist_ref
from palette_and_histo_gan_tpu.ops import histogram_pallas as hist_pl


@pytest.fixture(autouse=True)
def _interpret_mode():
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("method", ["inverse-quadratic", "RBF"])
def test_forward_parity(method):
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 4)), jnp.float32)
    ours = hist_pl.calculate_rgbuv_histogram_pallas(batch, size=16, method=method)
    ref = hist_ref.calculate_rgbuv_histogram(batch, size=16, method=method)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_forward_parity_full_size():
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 4)), jnp.float32)
    ours = hist_pl.calculate_rgbuv_histogram_pallas(batch)
    ref = hist_ref.calculate_rgbuv_histogram(batch)
    assert ours.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("method", ["inverse-quadratic", "RBF"])
def test_gradient_parity(method):
    rng = np.random.default_rng(2)
    batch = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 8, 8, 4)), jnp.float32)
    target = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 8, 8, 4)), jnp.float32)

    def loss_pl(x):
        h = hist_pl.calculate_rgbuv_histogram_pallas(x, size=16, method=method)
        t = hist_pl.calculate_rgbuv_histogram_pallas(target, size=16, method=method)
        return hist_ref.hellinger_loss(t, h)

    def loss_ref(x):
        h = hist_ref.calculate_rgbuv_histogram(x, size=16, method=method)
        t = hist_ref.calculate_rgbuv_histogram(target, size=16, method=method)
        return hist_ref.hellinger_loss(t, h)

    g_pl = jax.grad(loss_pl)(batch)
    g_ref = jax.grad(loss_ref)(batch)
    np.testing.assert_allclose(g_pl, g_ref, rtol=5e-3, atol=1e-6)
    np.testing.assert_allclose(g_pl[..., 3], 0.0)  # alpha gets no gradient


def test_hellinger_value_against_reference_impl():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 4)), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 4)), jnp.float32)
    ha = hist_pl.calculate_rgbuv_histogram_pallas(a, size=16)
    hb = hist_pl.calculate_rgbuv_histogram_pallas(b, size=16)
    ra = hist_ref.calculate_rgbuv_histogram(a, size=16)
    rb = hist_ref.calculate_rgbuv_histogram(b, size=16)
    np.testing.assert_allclose(
        hist_ref.hellinger_loss(ha, hb), hist_ref.hellinger_loss(ra, rb), rtol=1e-3
    )


# ---------------------------------------------------------------------------
# v2 kernel (histogram_pallas2: lane-full (size, HW) layout, bf16 chain)
# ---------------------------------------------------------------------------

from palette_and_histo_gan_tpu.ops import histogram_pallas2 as hist_pl2


@pytest.mark.parametrize("method", ["inverse-quadratic", "RBF"])
def test_v2_forward_parity(method):
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 4)), jnp.float32)
    ours = hist_pl2.calculate_rgbuv_histogram_pallas2(
        batch, size=16, method=method, dtype=jnp.float32
    )
    ref = hist_ref.calculate_rgbuv_histogram(batch, size=16, method=method)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("method", ["inverse-quadratic"])
def test_v2_gradient_parity(method):
    rng = np.random.default_rng(2)
    batch = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 8, 8, 4)), jnp.float32)
    target = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 8, 8, 4)), jnp.float32)

    def loss_pl(x):
        h = hist_pl2.calculate_rgbuv_histogram_pallas2(
            x, size=16, method=method, dtype=jnp.float32
        )
        t = hist_pl2.calculate_rgbuv_histogram_pallas2(
            target, size=16, method=method, dtype=jnp.float32
        )
        return hist_ref.hellinger_loss(t, h)

    def loss_ref(x):
        h = hist_ref.calculate_rgbuv_histogram(x, size=16, method=method)
        t = hist_ref.calculate_rgbuv_histogram(target, size=16, method=method)
        return hist_ref.hellinger_loss(t, h)

    g_pl = jax.grad(loss_pl)(batch)
    g_ref = jax.grad(loss_ref)(batch)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ref), atol=3e-4 * scale
    )
    assert float(jnp.abs(g_pl[..., 3]).max()) == 0.0  # alpha never contributes


# ---------------------------------------------------------------------------
# v3 backward (histogram_pallas3: blocked single-pass-per-channel, selected
# through calculate_rgbuv_histogram(..., bwd="pallas"))
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", ["inverse-quadratic", "RBF"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_v3_backward_parity(method, dtype):
    """bwd='pallas' gradients match the tri backward (forward is shared code)."""
    rng = np.random.default_rng(4)
    batch = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 8, 8, 4)), jnp.float32)
    target = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 8, 8, 4)), jnp.float32)

    def make_loss(bwd):
        def loss(x):
            h = hist_ref.calculate_rgbuv_histogram(
                x, size=16, method=method, dtype=dtype, bwd=bwd
            )
            t = hist_ref.calculate_rgbuv_histogram(
                target, size=16, method=method, dtype=dtype, bwd=bwd
            )
            return hist_ref.hellinger_loss(t, h)

        return loss

    g_ref = jax.grad(make_loss("tri"))(batch)
    g_pl = jax.grad(make_loss("pallas"))(batch)
    scale = float(jnp.abs(g_ref).max())
    tol = 1e-4 if dtype == jnp.float32 else 6e-3  # bf16 reduction-order
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ref), atol=tol * scale
    )
    assert float(jnp.abs(g_pl[..., 3]).max()) == 0.0


def test_v3_backward_parity_odd_batch():
    """Non-multiple-of-8 batches fall back to block=1 and stay exact."""
    rng = np.random.default_rng(5)
    batch = jnp.asarray(rng.uniform(-0.9, 0.9, (3, 8, 8, 4)), jnp.float32)
    target = jnp.asarray(rng.uniform(-0.9, 0.9, (3, 8, 8, 4)), jnp.float32)

    def make_loss(bwd):
        def loss(x):
            h = hist_ref.calculate_rgbuv_histogram(x, size=16, bwd=bwd)
            t = hist_ref.calculate_rgbuv_histogram(target, size=16, bwd=bwd)
            return hist_ref.hellinger_loss(t, h)

        return loss

    g_ref = jax.grad(make_loss("tri"))(batch)
    g_pl = jax.grad(make_loss("pallas"))(batch)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ref), atol=1e-4 * scale
    )
