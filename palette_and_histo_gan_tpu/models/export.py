"""Serving export: AOT-serializable inference functions.

Capability parity with the reference's keras SavedModel export of the
generator/discriminator (side2side_model.py:178-200), TPU-native style:
`jax.export` serializes the jitted inference function (StableHLO) together
with the weights, so a serving process can run it without the model code.
Serving semantics follow keras SavedModel inference (training=False: dropout
disabled; InstanceNorm has no running stats so it is unchanged).

The raw-params msgpack export in train/checkpoint.py remains the
weight-interchange path; this module is the *program* export.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..config import Config
from ..train.state import Models


def export_generator_serialized(
    config: Config, models: Models, g_params, batch_size: int = 1
) -> bytes:
    """Serialize the generator's inference program + weights to bytes.

    Applies config.infer_head_conv (same rule as train.steps.generate_core):
    an exported program is backward-free, so the narrow head conv is exposed
    to the degenerate channels-minor emitter the inference trace found
    (docs/DESIGN.md "Inference/serving path"); the swap is param-compatible
    and exact.
    """
    from ..train.steps import inference_models

    generator = inference_models(config, models).generator

    def infer(source):
        return generator.apply(
            {"params": g_params}, source, deterministic=True
        )

    spec = jax.ShapeDtypeStruct(
        (batch_size, config.img_size, config.img_size, config.generator_in_channels),
        jnp.float32,
    )
    exported = jax.export.export(jax.jit(infer))(spec)
    return exported.serialize()


def export_discriminator_serialized(
    config: Config, models: Models, d_params, batch_size: int = 1
) -> bytes:
    from ..train.steps import inference_models

    discriminator = inference_models(config, models).discriminator

    def infer(target, source):
        return discriminator.apply({"params": d_params}, target, source)

    spec = jax.ShapeDtypeStruct(
        (
            batch_size,
            config.img_size,
            config.img_size,
            config.discriminator_in_channels,
        ),
        jnp.float32,
    )
    exported = jax.export.export(jax.jit(infer))(spec, spec)
    return exported.serialize()


def save_exported(config: Config, which: str, blob: bytes) -> str:
    """Write to models/exported/<which>/<arch>/<model>/program.bin."""
    path = os.path.join(
        "models", "exported", which, config.architecture_name, config.model
    )
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "program.bin")
    with open(out, "wb") as f:
        f.write(blob)
    return out


def load_exported(path: str):
    """Deserialize an exported program; returns a callable."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax.export.deserialize(blob)
    return exported.call
