"""Device-mesh parallelism: mesh construction and data-parallel train steps."""

from .distributed import global_mesh_info, initialize
from .dp import make_dp_generate_fn, make_dp_train_chunk, make_dp_train_step
from .mesh import (
    batch_sharding,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
    state_sharding,
)

__all__ = [
    "global_mesh_info",
    "initialize",
    "make_dp_generate_fn",
    "make_dp_train_chunk",
    "make_dp_train_step",
    "batch_sharding",
    "make_mesh",
    "replicate_state",
    "replicated",
    "shard_batch",
    "state_sharding",
]
