import jax
import jax.numpy as jnp
import numpy as np

from palette_and_histo_gan_tpu.models import (
    InstanceNorm,
    PatchDiscriminator,
    UnetGenerator,
)


def _count_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_instance_norm_values():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(3.0, 2.0, (2, 8, 8, 4)), jnp.float32)
    model = InstanceNorm()
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    # fresh init: gamma=1, beta=0 -> per-(sample,channel) standardization
    expected = (np.asarray(x) - np.asarray(x).mean((1, 2), keepdims=True)) / np.sqrt(
        np.asarray(x).var((1, 2), keepdims=True) + 1e-3
    )
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_generator_rgba_shapes_and_params():
    model = UnetGenerator(input_channels=4, output_channels=4, last_activation="tanh")
    x = jnp.zeros((2, 64, 64, 4))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    y = model.apply(variables, x, deterministic=True)
    assert y.shape == (2, 64, 64, 4)
    assert float(y.min()) >= -1.0 and float(y.max()) <= 1.0  # tanh head
    # parameter-count parity vs the reference (29.3M printed at init,
    # pix2pix_model.py:25): conv kernels + head bias + InstanceNorm scale/offset
    n = _count_params(variables["params"])
    expected_convs = (
        4 * 4 * 4 * 64          # down1
        + 4 * 4 * 64 * 128      # down2
        + 4 * 4 * 128 * 256
        + 4 * 4 * 256 * 512
        + 4 * 4 * 512 * 512
        + 4 * 4 * 512 * 512     # down6 (bottleneck)
        + 4 * 4 * 512 * 512     # up1 (in 512)
        + 4 * 4 * 1024 * 512    # up2 (in 1024 after concat)
        + 4 * 4 * 1024 * 256
        + 4 * 4 * 512 * 128
        + 4 * 4 * 256 * 64
        + 4 * 4 * 128 * 32
        + 4 * 4 * 36 * 4 + 4    # head (+bias)
    )
    norm_channels = (128 + 256 + 512 + 512 + 512) + (512 + 512 + 256 + 128 + 64 + 32)
    expected = expected_convs + 2 * norm_channels
    assert n == expected, (n, expected)
    assert 29_000_000 < n < 29_500_000


def test_generator_indexed_softmax_head():
    model = UnetGenerator(input_channels=1, output_channels=256, last_activation="softmax")
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    y = model.apply(variables, x, deterministic=True)
    assert y.shape == (1, 64, 64, 256)
    np.testing.assert_allclose(jnp.sum(y, -1), np.ones((1, 64, 64)), rtol=1e-4)


def test_generator_dropout_active_when_not_deterministic():
    # narrow widths keep single-core compile time down; structure is identical
    model = UnetGenerator(down_filters=(8, 8, 8, 8, 8, 8), up_filters=(8, 8, 8, 8, 8, 8))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 4)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    y1 = model.apply(variables, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = model.apply(variables, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    # different dropout masks -> different outputs (reference always runs
    # training=True, pix2pix_model.py:67)
    assert float(jnp.max(jnp.abs(y1 - y2))) > 0


def test_discriminator_shapes_and_params():
    model = PatchDiscriminator(input_channels=4)
    t = jnp.zeros((2, 64, 64, 4))
    s = jnp.zeros((2, 64, 64, 4))
    variables = model.init(jax.random.PRNGKey(0), t, s)
    y = model.apply(variables, t, s)
    assert y.shape == (2, 32, 32, 1)  # 32x32 patch logits (networks.py:46-48)
    n = _count_params(variables["params"])
    expected = 4 * 4 * 8 * 64 + (4 * 4 * 64 * 1 + 1)  # ~9.2K (SURVEY §2 #8)
    assert n == expected, (n, expected)


def test_discriminator_not_symmetric_in_args():
    # concat order [target, source] matters (networks.py:45)
    model = PatchDiscriminator(input_channels=4)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(1, 64, 64, 4)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, 64, 64, 4)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), a, b)
    y_ab = model.apply(variables, a, b)
    y_ba = model.apply(variables, b, a)
    assert float(jnp.max(jnp.abs(y_ab - y_ba))) > 1e-4


def test_generator_bfloat16_compute():
    model = UnetGenerator(dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 4))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    y = model.apply(variables, x, deterministic=True)
    assert y.dtype == jnp.float32  # head casts back
    # params stay float32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(variables["params"]))


def test_dup_out_conv_matches_plain_conv():
    """DupOutConv (head_conv="dup8") is numerically equivalent to nn.Conv on
    the same param tree — G head (k=2 replicas) exact, D head (k=8) to float
    noise (models/networks.py::DupOutConv)."""
    import flax.linen as nn

    from palette_and_histo_gan_tpu.models.networks import DupOutConv, conv_init

    rng = np.random.default_rng(0)
    for cin, feats in [(36, 4), (64, 1)]:
        x = jnp.asarray(rng.normal(size=(2, 8, 8, cin)), jnp.float32)
        plain = nn.Conv(
            feats, kernel_size=(4, 4), padding="SAME", use_bias=True,
            kernel_init=conv_init,
        )
        dup = DupOutConv(feats)
        params = plain.init(jax.random.PRNGKey(1), x)
        assert jax.tree.map(jnp.shape, params) == jax.tree.map(
            jnp.shape, dup.init(jax.random.PRNGKey(2), x)
        )
        y1, y2 = plain.apply(params, x), dup.apply(params, x)
        np.testing.assert_allclose(y1, y2, atol=1e-5)
        g1 = jax.grad(lambda p: jnp.sum(jnp.sin(plain.apply(p, x))))(params)
        g2 = jax.grad(lambda p: jnp.sum(jnp.sin(dup.apply(p, x))))(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(a, b, atol=1e-4)


def test_discriminator_input_split_matches_concat():
    """input_split=True (implicit-concat half-kernel convs) equals the
    concat form on the same params, values and gradients
    (models/networks.py::_SplitConcatConv)."""
    rng = np.random.default_rng(3)
    t = jnp.asarray(rng.normal(size=(2, 16, 16, 4)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(2, 16, 16, 4)), jnp.float32)
    base = PatchDiscriminator()
    split = PatchDiscriminator(input_split=True)
    params = base.init(jax.random.PRNGKey(0), t, s)
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(
        jnp.shape, split.init(jax.random.PRNGKey(1), t, s)
    )
    np.testing.assert_allclose(
        base.apply(params, t, s), split.apply(params, t, s), atol=1e-5
    )
    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(base.apply(p, t, s))))(params)
    g2 = jax.grad(lambda p: jnp.sum(jnp.sin(split.apply(p, t, s))))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_flipgrad_convtranspose_matches_lax():
    """transpose_impl="lax_flipgrad" (weight-grad reverse moved onto the
    (4,4,Cin,Cout) result instead of the (B,2H,2W,C) cotangent — see
    models/networks.py::_convt_k4s2_flipgrad) is the identical forward and
    the same gradients as flax nn.ConvTranspose, on the same param tree."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 4)), jnp.float32)
    net_lax = UnetGenerator(transpose_impl="lax")
    net_fg = UnetGenerator(transpose_impl="lax_flipgrad")
    params = net_lax.init(jax.random.PRNGKey(0), x, deterministic=True)
    # identical param tree (names/shapes), so checkpoints interchange
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(
        jnp.shape, net_fg.init(jax.random.PRNGKey(1), x, deterministic=True)
    )
    y1 = net_lax.apply(params, x, deterministic=True)
    y2 = net_fg.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def loss(p, net):
        return jnp.sum(jnp.square(net.apply(p, x, deterministic=True)))

    g1 = jax.grad(loss)(params, net_lax)
    g2 = jax.grad(loss)(params, net_fg)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        scale = float(jnp.abs(a).max()) + 1e-12
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale
        )


def test_swapgrad_head_matches_plain_conv():
    """head_conv="swapgrad" (weight-grad operand roles swapped so the wide
    input-channel dim drives the emitter — see
    models/networks.py::_conv_k4s1_swapgrad) equals plain nn.Conv on the
    same params, values and gradients, for both head shapes (36->4, 64->1)."""
    from palette_and_histo_gan_tpu.models.networks import SwapGradConv, conv_init
    import flax.linen as nn

    rng = np.random.default_rng(9)
    for cin, feats in [(36, 4), (64, 1)]:
        x = jnp.asarray(rng.normal(size=(2, 16, 16, cin)), jnp.float32)
        plain = nn.Conv(
            feats, kernel_size=(4, 4), padding="SAME", use_bias=True,
            kernel_init=conv_init,
        )
        swap = SwapGradConv(feats)
        params = plain.init(jax.random.PRNGKey(1), x)
        assert jax.tree.map(jnp.shape, params) == jax.tree.map(
            jnp.shape, swap.init(jax.random.PRNGKey(2), x)
        )
        y1, y2 = plain.apply(params, x), swap.apply(params, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
        g1 = jax.grad(lambda p: jnp.sum(jnp.sin(plain.apply(p, x))))(params)
        g2 = jax.grad(lambda p: jnp.sum(jnp.sin(swap.apply(p, x))))(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-4
            )


def test_nchw_head_matches_plain_conv():
    """head_conv="nchw" (NCHW out_spec, inference-only lowering — see
    models/networks.py::NCHWOutConv) equals plain nn.Conv on the same
    params for both narrow head shapes."""
    from palette_and_histo_gan_tpu.models.networks import NCHWOutConv, conv_init
    import flax.linen as nn

    rng = np.random.default_rng(11)
    for cin, feats in [(36, 4), (64, 1)]:
        x = jnp.asarray(rng.normal(size=(2, 16, 16, cin)), jnp.float32)
        plain = nn.Conv(
            feats, kernel_size=(4, 4), padding="SAME", use_bias=True,
            kernel_init=conv_init,
        )
        nchw = NCHWOutConv(feats)
        params = plain.init(jax.random.PRNGKey(1), x)
        assert jax.tree.map(jnp.shape, params) == jax.tree.map(
            jnp.shape, nchw.init(jax.random.PRNGKey(2), x)
        )
        y1, y2 = plain.apply(params, x), nchw.apply(params, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_generate_core_infer_head_nchw_matches_train_head():
    """generate_core under config.infer_head_conv="nchw" produces the same
    images as the training head from the same params (same dropout RNG
    path: the head swap renames no module)."""
    import dataclasses

    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.train.state import build_models, create_train_state
    from palette_and_histo_gan_tpu.train.steps import generate_core

    config = config_for_variant(
        "baseline-no-aug",
        batch_size=2,
        down_filters=(8, 8, 8, 8, 8, 8),
        up_filters=(8, 8, 8, 8, 8, 8),
        donate_state=False,
    )
    models = build_models(config)
    state = create_train_state(config, models, jax.random.PRNGKey(0))
    src = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (2, 64, 64, 4)), jnp.float32
    )
    key = jax.random.PRNGKey(7)
    ref = generate_core(config, models)(state.g_params, src, key)
    nchw_cfg = dataclasses.replace(config, infer_head_conv="nchw")
    out = generate_core(nchw_cfg, models)(state.g_params, src, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
