"""Data-parallel train step: jit over a mesh with explicit shardings.

The single-chip step functions in train/steps.py are pure, so scaling them
is purely a sharding problem: batch inputs sharded over "data", state
replicated, metrics replicated. XLA compiles the cross-chip gradient
all-reduce (psum over ICI) from these constraints — no hand-written
collectives (SURVEY.md §2.3).

Loss semantics under DP: each shard computes a per-shard mean loss and the
all-reduced gradient equals the gradient of the global-batch mean, because
every loss term is a mean over batch elements. This matches scaling the
reference's batch up on one device (tested for numerical equality on a
virtual 8-device CPU mesh, tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..train.state import Models, TrainState
from ..train.steps import indexed_train_step, rgba_train_step
from .mesh import batch_sharding, replicated


def make_dp_train_step(
    config: Config, models: Models, mesh: Mesh
) -> Callable:
    """(state, *batch) -> (state, metrics), batch sharded over the data axis.

    The returned function expects `state` replicated (see
    mesh.replicate_state) and batch arrays with leading dim divisible by the
    data-axis size; shard_batch places host arrays correctly.
    """
    if config.is_indexed:
        fn = partial(indexed_train_step, config, models)
    else:
        fn = partial(rgba_train_step, config, models)

    data_sh = batch_sharding(mesh, config.data_axis)
    repl = replicated(mesh)

    return jax.jit(
        fn,
        in_shardings=(None, data_sh, data_sh),
        out_shardings=(None, repl),
        donate_argnums=(0,) if config.donate_state else (),
    )


def make_dp_generate_fn(config: Config, models: Models, mesh: Mesh) -> Callable:
    """Batched inference with the batch sharded across the mesh."""
    from ..train.steps import make_generate_fn  # unjitted core

    data_sh = batch_sharding(mesh, config.data_axis)

    def generate(g_params, source, rng):
        if config.is_indexed:
            import jax.numpy as jnp

            probs = models.generator.apply(
                {"params": g_params},
                source.astype(jnp.float32),
                deterministic=False,
                rngs={"dropout": rng},
            )
            return jnp.argmax(probs, axis=-1)[..., None].astype(jnp.int32)
        return models.generator.apply(
            {"params": g_params},
            source,
            deterministic=False,
            rngs={"dropout": rng},
        )

    return jax.jit(
        generate,
        in_shardings=(None, data_sh, None),
        out_shardings=data_sh,
    )
