"""Train state: a single pytree holding both networks and optimizer states.

Replaces the reference's object soup (two keras models, two tf.keras Adam
optimizers, and a tf.train.Checkpoint wiring them together,
pix2pix_model.py:17-36) with one immutable flax.struct pytree that jits,
donates, shards, and checkpoints as a unit.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.networks import (
    PatchDiscriminator,
    UnetGenerator,
    build_discriminator,
    build_generator,
)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # () int32
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    rng: jax.Array


class Models(NamedTuple):
    """Static (non-pytree) companions of a TrainState."""

    generator: UnetGenerator
    discriminator: PatchDiscriminator
    g_tx: optax.GradientTransformation
    d_tx: optax.GradientTransformation


def scale_by_keras_adam(
    b1: float, b2: float, eps: float
) -> optax.GradientTransformation:
    """Adam scaling with the KERAS epsilon convention.

    tf.keras Adam folds the bias corrections into the step size and applies
    eps to the UNCORRECTED second moment:

        delta = lr * sqrt(1 - b2^t) / (1 - b1^t) * m / (sqrt(v) + eps)
              = lr * m_hat / (sqrt(v_hat) + eps / sqrt(1 - b2^t))

    optax.adam instead applies eps to the corrected sqrt(v_hat), making its
    effective epsilon ~sqrt(1/(1-b2^t)) SMALLER early in training (~32x at
    t=1 for b2=0.999). For near-zero-gradient parameters, where sqrt(v) is
    comparable to eps, the two conventions produce per-element updates that
    differ by tens of percent — pinned against keras apply_gradients in
    tests/test_parity.py::test_adam_update_parity. The reference trains
    with keras Adam (pix2pix_model.py:28-29), so this convention is the
    parity-exact one.
    """

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros()
        )

    def update(updates, state, params=None):
        del params
        mu = jax.tree.map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates
        )
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g), state.nu, updates
        )
        count = state.count + 1
        t = count.astype(jnp.float32)
        step_scale = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        scaled = jax.tree.map(
            lambda m, v: step_scale * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return scaled, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(config: Config) -> optax.GradientTransformation:
    """Adam(2e-4, beta1=0.5) x2 (pix2pix_model.py:28-29; keras eps 1e-7,
    keras epsilon placement — see scale_by_keras_adam)."""
    return optax.chain(
        scale_by_keras_adam(config.beta1, config.beta2, config.adam_eps),
        optax.scale(-config.learning_rate),
    )


def build_models(config: Config) -> Models:
    return Models(
        generator=build_generator(config),
        discriminator=build_discriminator(config),
        g_tx=make_optimizer(config),
        d_tx=make_optimizer(config),
    )


def create_train_state(config: Config, models: Models, rng: jax.Array) -> TrainState:
    """Initialize both networks and optimizer states."""
    k_g, k_d, k_state = jax.random.split(rng, 3)
    img = config.img_size
    g_in = jnp.zeros((1, img, img, config.generator_in_channels), jnp.float32)
    d_in = jnp.zeros((1, img, img, config.discriminator_in_channels), jnp.float32)

    g_vars = models.generator.init(k_g, g_in, deterministic=True)
    d_vars = models.discriminator.init(k_d, d_in, d_in)
    g_params = g_vars["params"]
    d_params = d_vars["params"]

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt_state=models.g_tx.init(g_params),
        d_opt_state=models.d_tx.init(d_params),
        rng=k_state,
    )


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
