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
    step_wants_packed,
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
        # mesh bound statically: pins the dropout PRNG to threefry (the
        # only impl with SPMD-invariance guarantees; see steps._dropout_key)
        fn = partial(indexed_train_step, config, models, mesh=mesh)
    else:
        # mesh bound statically: switches the Pallas augmentation (when
        # selected) to its shard_map form, which GSPMD can't partition
        # itself, and pins the dropout PRNG to threefry (see _dropout_key)
        fn = partial(rgba_train_step, config, models, mesh=mesh)

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
        _partial(indexed_train_step, config, models, mesh=mesh)
        if config.is_indexed
        else _partial(rgba_train_step, config, models, mesh=mesh)
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

        packed = step_wants_packed(config, mesh) and src_shape is not None

        def body(state, _):
            idx = batch_indices(
                data_key, state.step, dataset_size, config.batch_size
            )
            if packed:
                # the sharded Pallas augment kernel consumes the u32 pixels
                # directly (shard_map over the batch axis; unpack in VMEM)
                source, target = src_p[idx], tgt_p[idx]
            else:
                source = _unpack_rows_u32(src_p[idx], src_shape)
                target = _unpack_rows_u32(tgt_p[idx], tgt_shape)
            source = jax.lax.with_sharding_constraint(source, data_sh)
            target = jax.lax.with_sharding_constraint(target, data_sh)
            return step_fn(state, source, target)

        return jax.lax.scan(body, state, None, length=num_steps)

    return train_chunk


def make_dp_generate_fn(config: Config, models: Models, mesh: Mesh) -> Callable:
    """Batched inference with the batch sharded across the mesh.

    Used by the Trainer's evaluation/preview paths when a mesh is active
    (side2side_model.py:144-160's report_l1/report_fid generate work, which
    the reference runs one image at a time on its single device). The eval
    batch sizes (44 images, 6-image previews) rarely divide the device
    count, and jit rejects unevenly-sharded inputs — so the batch is padded
    to the next multiple of the data-axis size and the output sliced back.
    This is EXACTLY equal to the single-device THREEFRY generate for every
    batch size: binding `mesh` into generate_core pins the dropout PRNG to
    partitionable threefry (steps._dropout_key — XLA's RngBitGenerator
    stream is implementation-defined, with no prefix-stability or
    SPMD-invariance guarantees, so "rbg" configs fall back here), whose
    counter-mode draws ARE prefix-stable (row i of an (N, ...) draw depends
    only on the key and i, not N). Hence the dropout masks of the first n
    rows are bit-identical under padding, and the sharding itself does not
    change values (asserted in tests/test_parallel.py).
    """
    import jax.numpy as jnp

    from ..train.steps import generate_core

    data_sh = batch_sharding(mesh, config.data_axis)
    ndev = mesh.shape[config.data_axis]

    jitted = jax.jit(
        generate_core(config, models, mesh=mesh),
        in_shardings=(None, data_sh, None),
        out_shardings=data_sh,
    )

    def generate_padded(g_params, source, rng):
        source = jnp.asarray(source)
        n = source.shape[0]
        pad = (-n) % ndev
        if pad:
            filler = jnp.broadcast_to(
                source[:1], (pad,) + tuple(source.shape[1:])
            )
            source = jnp.concatenate([source, filler], axis=0)
        # callers hand over host arrays, single-device-committed arrays, or
        # replicated dataset slices; jit's explicit in_shardings refuses to
        # reshard committed args, so place the batch explicitly
        source = jax.device_put(source, data_sh)
        out = jitted(g_params, source, rng)
        return out[:n] if pad else out

    return generate_padded
