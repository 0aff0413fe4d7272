import jax.numpy as jnp
import numpy as np

from palette_and_histo_gan_tpu.ops import image as image_ops


def test_normalize_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 4, 4, 4)), jnp.float32)
    n = image_ops.normalize(x)
    assert float(n.min()) >= -1.0 and float(n.max()) <= 1.0
    np.testing.assert_allclose(image_ops.denormalize(n), x, atol=1e-4)


def test_normalize_values():
    np.testing.assert_allclose(
        image_ops.normalize(jnp.array([0.0, 127.5, 255.0])), [-1.0, 0.0, 1.0],
        atol=1e-6,
    )


def test_blacken_transparent_pixels():
    img = jnp.array(
        [[[10.0, 20.0, 30.0, 0.0], [10.0, 20.0, 30.0, 255.0]]]
    )  # (1, 2, 4)
    out = image_ops.blacken_transparent_pixels(img)
    np.testing.assert_allclose(out[0, 0], [0, 0, 0, 0])
    np.testing.assert_allclose(out[0, 1], [10, 20, 30, 255])


def test_blacken_batched():
    img = jnp.ones((3, 4, 4, 4)) * 9.0
    img = img.at[:, 0, 0, 3].set(0.0)
    out = image_ops.blacken_transparent_pixels(img)
    np.testing.assert_allclose(out[:, 0, 0, :], np.zeros((3, 4)))
    np.testing.assert_allclose(out[:, 1, 1, :], np.full((3, 4), 9.0))


def test_replace_alpha_with_white():
    img = jnp.array([[[10.0, 20.0, 30.0, 0.0], [10.0, 20.0, 30.0, 255.0]]])
    out = image_ops.replace_alpha_with_white(img)
    assert out.shape == (1, 2, 3)
    np.testing.assert_allclose(out[0, 0], [255, 255, 255])
    np.testing.assert_allclose(out[0, 1], [10, 20, 30])
