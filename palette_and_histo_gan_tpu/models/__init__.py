"""Model definitions: U-Net generator, PatchGAN discriminator, InceptionV3."""

from .networks import (
    InstanceNorm,
    DownBlock,
    UpBlock,
    UnetGenerator,
    PatchDiscriminator,
    build_generator,
    build_discriminator,
)

__all__ = [
    "InstanceNorm",
    "DownBlock",
    "UpBlock",
    "UnetGenerator",
    "PatchDiscriminator",
    "build_generator",
    "build_discriminator",
]
