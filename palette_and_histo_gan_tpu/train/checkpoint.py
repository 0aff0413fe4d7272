"""Checkpointing and parameter export via orbax.

Capability parity with the reference plus the piece it is missing:
  - tf.train.Checkpoint over G, D, and both Adam states with
    CheckpointManager(max_to_keep=1) (pix2pix_model.py:30-36) -> orbax
    CheckpointManager over the whole TrainState pytree
  - checkpoint dir <temp>/training-checkpoints/<arch>/<model>
    (side2side_model.py:50-51)
  - SavedModel export/import of generator/discriminator params under
    models/py/{generator,discriminator}/<arch>/<model>
    (side2side_model.py:178-200) -> msgpack via flax.serialization
  - genuine restore-and-resume: the reference saves but never calls
    checkpoint.restore (SURVEY.md §5); `restore` here round-trips the full
    state including optimizer moments and the step counter.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization

from ..config import Config
from .state import TrainState


def checkpoint_dir(config: Config) -> str:
    return os.path.abspath(
        os.path.join(
            config.temp_folder,
            "training-checkpoints",
            config.architecture_name,
            config.model,
        )
    )


def make_manager(config: Config, max_to_keep: int = 1) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        checkpoint_dir(config),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save(manager: ocp.CheckpointManager, state: TrainState) -> None:
    step = int(state.step)
    manager.save(step, args=ocp.args.StandardSave(state))


def restore(manager: ocp.CheckpointManager, reference_state: TrainState) -> TrainState:
    """Restore the latest checkpoint into the structure of reference_state."""
    step = manager.latest_step()
    if step is None:
        return reference_state
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, reference_state)
    return manager.restore(step, args=ocp.args.StandardRestore(abstract))


# --------------------------------------------------------------------------
# Parameter export (SavedModel-equivalent)
# --------------------------------------------------------------------------


def _export_path(config: Config, which: str) -> str:
    return os.path.join(
        "models", "py", which, config.architecture_name, config.model
    )


def save_params(config: Config, which: str, params) -> str:
    """Export a network's params (which: 'generator' | 'discriminator')."""
    path = _export_path(config, which)
    os.makedirs(path, exist_ok=True)
    blob = serialization.to_bytes(params)
    out = os.path.join(path, "params.msgpack")
    with open(out, "wb") as f:
        f.write(blob)
    return out


def load_params(config: Config, which: str, reference_params):
    """Load exported params into the structure of reference_params."""
    path = os.path.join(_export_path(config, which), "params.msgpack")
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(reference_params, blob)


def params_equal(a, b) -> bool:
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )
