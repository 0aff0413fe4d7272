"""palette_and_histo_gan_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of
fegemo/palette-and-histo-gan.

Paired pixel-art image-to-image GANs (pix2pix U-Net generator + PatchGAN
discriminator) in four variants — baseline (no aug.), baseline, indexed
(palette-index prediction), and histogram (differentiable RGB-uv color
histogram loss) — rebuilt as pure functional JAX with jitted train steps,
device-resident data, Pallas kernels for the custom ops, on-TPU FID, and
data-parallel scaling over a `jax.sharding.Mesh`.
"""

from .config import (
    Config,
    config_for_variant,
    MODEL_VARIANTS,
    DIRECTIONS,
    DIRECTION_BACK,
    DIRECTION_LEFT,
    DIRECTION_FRONT,
    DIRECTION_RIGHT,
)

__version__ = "0.1.0"

__all__ = [
    "Config",
    "config_for_variant",
    "MODEL_VARIANTS",
    "DIRECTIONS",
    "DIRECTION_BACK",
    "DIRECTION_LEFT",
    "DIRECTION_FRONT",
    "DIRECTION_RIGHT",
]
