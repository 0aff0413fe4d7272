"""Model definitions: U-Net generator, PatchGAN discriminator, InceptionV3."""

from . import convert
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
    "convert",
    "InstanceNorm",
    "DownBlock",
    "UpBlock",
    "UnetGenerator",
    "PatchDiscriminator",
    "build_generator",
    "build_discriminator",
]
