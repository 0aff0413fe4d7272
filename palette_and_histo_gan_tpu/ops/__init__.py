"""Pure-JAX and Pallas compute ops: image transforms, augmentation, palette
extraction/quantization, and the differentiable color histogram."""

from . import augment, histogram, image, palette

__all__ = ["augment", "histogram", "image", "palette"]
