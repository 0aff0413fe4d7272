"""Device-mesh construction and sharding specs for data-parallel training.

The reference is single-device (SURVEY.md §2.3: no tf.distribute anywhere).
The TPU-native build scales via a 1-D `jax.sharding.Mesh` over the "data"
axis: batches are sharded across chips, parameters and optimizer state are
replicated, and XLA inserts the gradient all-reduce (psum over ICI) when the
jitted train step consumes sharded batch inputs under these output shardings.

A second, size-1 "model" axis is reserved so tensor-style sharding of conv
channels could be introduced without re-plumbing callers — at 29M params it
is intentionally unused (SURVEY.md §2.3).

Multi-host: call jax.distributed.initialize() before building the mesh; the
mesh spans all global devices and the data axis rides ICI within a slice and
DCN across hosts.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """1-D data-parallel mesh (with a reserved size-1 model axis)."""
    if devices is None:
        devices = jax.devices()
    arr = np.asarray(devices).reshape(len(devices), 1)
    return Mesh(arr, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, data_axis: str = "data"):
    """Place a pytree of batched arrays with the batch dim sharded."""
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(mesh: Mesh, state):
    """Replicate a TrainState (params + opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def state_sharding(mesh: Mesh, state):
    """Sharding pytree for a replicated state (for jit in/out_shardings)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda _: sharding, state)
