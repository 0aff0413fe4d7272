"""Flax U-Net generator and PatchGAN discriminator.

TPU-native rebuild of /root/reference/networks.py. Architecture parity:

  - unet_downsample (networks.py:7-21): Conv k4 s2 SAME, no bias,
    kernel init N(0, 0.02), optional InstanceNorm, LeakyReLU (keras default
    negative slope 0.3)
  - unet_upsample (networks.py:24-36): ConvTranspose k4 s2 SAME, no bias,
    InstanceNorm, optional Dropout(0.5), ReLU
  - UnetGenerator (networks.py:53-98): encoder 64(no-norm)/128/256/512/512/512
    down to a 1x1 bottleneck; decoder 512(do)/512(do)/256(do)/128/64/32 with
    skip concats using the reversed encoder activations *plus the raw input as
    the final skip* (networks.py:92); head Conv k4 s1 SAME with bias and
    tanh (RGBA) or softmax (indexed) activation
  - PatchDiscriminator (networks.py:39-50): concat([target, source]) ->
    downsample(64, no norm) -> Conv(1, k4, SAME, bias) -> (B, 32, 32, 1)
    patch logits

The reference's "apply_batchnorm" flag actually instantiates
tensorflow_addons InstanceNormalization (networks.py:18) — per-(sample,
channel) normalization over H, W with eps 1e-3 (the tfa default) and learned
scale/offset; reproduced here by hand (~10 lines, fully fused by XLA).

`dtype` selects the conv compute dtype (bfloat16 for MXU throughput); params
and normalization statistics stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

LEAKY_RELU_SLOPE = 0.3  # keras layers.LeakyReLU() default
INSTANCE_NORM_EPS = 1e-3  # tensorflow_addons GroupNorm/InstanceNorm default

conv_init = nn.initializers.normal(stddev=0.02)


class InstanceNorm(nn.Module):
    """Per-(sample, channel) normalization over spatial dims, with learned
    scale and offset (tfa InstanceNormalization semantics)."""

    epsilon: float = INSTANCE_NORM_EPS

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        normed = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        features = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        beta = self.param("offset", nn.initializers.zeros, (features,), jnp.float32)
        return (normed * gamma + beta).astype(orig_dtype)


class DownBlock(nn.Module):
    """Conv k4 s2 -> [InstanceNorm] -> LeakyReLU (networks.py:7-21)."""

    filters: int
    apply_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.filters,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
        )(x)
        if self.apply_norm:
            x = InstanceNorm()(x)
        return nn.leaky_relu(x, negative_slope=LEAKY_RELU_SLOPE)


class UpBlock(nn.Module):
    """ConvTranspose k4 s2 -> InstanceNorm -> [Dropout 0.5] -> ReLU
    (networks.py:24-36)."""

    filters: int
    apply_dropout: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = False) -> jnp.ndarray:
        x = nn.ConvTranspose(
            self.filters,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
        )(x)
        x = InstanceNorm()(x)
        if self.apply_dropout:
            x = nn.Dropout(rate=0.5, deterministic=deterministic)(x)
        return nn.relu(x)


class UnetGenerator(nn.Module):
    """6-down/6-up U-Net with input-as-last-skip (networks.py:53-98)."""

    input_channels: int = 4
    output_channels: int = 4
    last_activation: str = "tanh"  # "tanh" | "softmax" | "linear"
    dtype: Any = jnp.float32
    down_filters: Sequence[int] = (64, 128, 256, 512, 512, 512)
    up_filters: Sequence[int] = (512, 512, 256, 128, 64, 32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = False) -> jnp.ndarray:
        inputs = x
        skips = []
        for i, filters in enumerate(self.down_filters):
            x = DownBlock(filters, apply_norm=(i != 0), dtype=self.dtype)(x)
            skips.append(x)

        # drop the bottleneck activation, reverse, append raw input as the
        # final skip (networks.py:89-92)
        skip_sources = list(reversed(skips[:-1])) + [inputs]

        for i, (filters, skip) in enumerate(zip(self.up_filters, skip_sources)):
            x = UpBlock(filters, apply_dropout=(i < 3), dtype=self.dtype)(
                x, deterministic=deterministic
            )
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)

        x = nn.Conv(
            self.output_channels,
            kernel_size=(4, 4),
            padding="SAME",
            use_bias=True,
            kernel_init=conv_init,
            dtype=self.dtype,
        )(x)
        x = x.astype(jnp.float32)
        if self.last_activation == "tanh":
            x = jnp.tanh(x)
        elif self.last_activation == "softmax":
            x = nn.softmax(x, axis=-1)
        elif self.last_activation != "linear":
            raise ValueError(f"unknown activation {self.last_activation!r}")
        return x


class PatchDiscriminator(nn.Module):
    """Shallow PatchGAN: one downsample then a 1-channel conv head
    (networks.py:39-50). Output: (B, 32, 32, 1) patch logits."""

    input_channels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, target: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
        # concat order is [target, source] (networks.py:45)
        x = jnp.concatenate(
            [target.astype(self.dtype), source.astype(self.dtype)], axis=-1
        )
        x = DownBlock(64, apply_norm=False, dtype=self.dtype)(x)
        x = nn.Conv(
            1,
            kernel_size=(4, 4),
            padding="SAME",
            use_bias=True,
            kernel_init=conv_init,
            dtype=self.dtype,
        )(x)
        return x.astype(jnp.float32)


def build_generator(config) -> UnetGenerator:
    """Generator for a config (pix2pix_model.py:38-39, :267-268)."""
    return UnetGenerator(
        input_channels=config.generator_in_channels,
        output_channels=config.generator_out_channels,
        last_activation=config.generator_last_activation,
        dtype=jnp.dtype(config.compute_dtype),
    )


def build_discriminator(config) -> PatchDiscriminator:
    """Discriminator for a config (pix2pix_model.py:41-42, :270-271)."""
    return PatchDiscriminator(
        input_channels=config.discriminator_in_channels,
        dtype=jnp.dtype(config.compute_dtype),
    )
