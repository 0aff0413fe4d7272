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
from ..train.steps import (
    _pack_rows_u32,
    _unpack_rows_u32,
    indexed_train_step,
    rgba_train_step,
    tpu_compiler_options,
)
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
        compiler_options=tpu_compiler_options(config),
    )


def make_dp_train_chunk(
    config: Config, models: Models, mesh: Mesh, dataset_size: int
) -> Callable:
    """Data-parallel variant of train.steps.make_train_chunk: many steps fused
    into one XLA program via lax.scan, batches sharded over the mesh.

    (state, dataset_arrays, data_key, num_steps) -> (state, stacked_metrics)

    The HBM-resident dataset stays replicated (it is ~5 MB); every scan
    iteration computes the epoch-permutation batch indices identically on all
    devices, gathers the batch locally, and a sharding constraint splits it
    over the "data" axis — from there GSPMD partitions both networks' fwd/bwd
    and inserts the gradient all-reduce (psum over ICI), keeping params and
    optimizer state replicated. This is the multi-chip path BASELINE.json's
    large-batch v5e-8 sweep config requires (SURVEY.md §2.3).
    """
    from functools import partial as _partial

    from ..data.loader import batch_indices

    step_fn = (
        _partial(indexed_train_step, config, models)
        if config.is_indexed
        else _partial(rgba_train_step, config, models)
    )
    data_sh = batch_sharding(mesh, config.data_axis)

    @_partial(
        jax.jit,
        static_argnames=("num_steps",),
        donate_argnums=(0,) if config.donate_state else (),
        compiler_options=tpu_compiler_options(config),
    )
    def train_chunk(state: TrainState, dataset, data_key, num_steps: int):
        # 4-byte-lane gather of the uint8 splits (see steps._pack_rows_u32)
        (src_p, src_shape), (tgt_p, tgt_shape) = (
            _pack_rows_u32(dataset[0]),
            _pack_rows_u32(dataset[1]),
        )

        def body(state, _):
            idx = batch_indices(
                data_key, state.step, dataset_size, config.batch_size
            )
            source = jax.lax.with_sharding_constraint(
                _unpack_rows_u32(src_p[idx], src_shape), data_sh
            )
            target = jax.lax.with_sharding_constraint(
                _unpack_rows_u32(tgt_p[idx], tgt_shape), data_sh
            )
            return step_fn(state, source, target)

        return jax.lax.scan(body, state, None, length=num_steps)

    return train_chunk


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
