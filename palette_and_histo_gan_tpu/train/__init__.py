"""Training engine: state, losses, jitted steps, loop, checkpointing."""

from .losses import (
    bce_with_logits,
    categorical_crossentropy_probs,
    discriminator_loss,
    generator_loss,
)
from .state import Models, TrainState, build_models, create_train_state, param_count
from .steps import (
    make_discriminate_fn,
    make_generate_fn,
    make_train_chunk,
    make_train_step,
)

__all__ = [
    "bce_with_logits",
    "categorical_crossentropy_probs",
    "discriminator_loss",
    "generator_loss",
    "Models",
    "TrainState",
    "build_models",
    "create_train_state",
    "param_count",
    "make_discriminate_fn",
    "make_generate_fn",
    "make_train_chunk",
    "make_train_step",
]
