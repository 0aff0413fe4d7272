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


class PaddedOutConv(nn.Module):
    """Conv k4 s1 SAME with bias whose output channels are zero-padded to a
    TPU-friendly lane count for the convolution itself, then sliced back.

    MEASURED-NEGATIVE ALTERNATIVE, kept unused for the record. Motivation:
    the generator head (36 -> 4, networks.py:95-97) and discriminator patch
    head (64 -> 1, networks.py:48-49) weight-grad convs run degenerate
    T(4,128)/T(1,128) emitters at >10x their FLOP cost (1.79 ms/step for a
    9 KB gradient at batch 1024). This module computes the conv at `pad_to`
    channels — bit-exact for the kept channels (zero weights never mix in;
    the parameter gradient is the exact slice of the padded one; verified on
    CPU to 0.0 diff), with the reference's param shapes. Two optimization
    barriers are required or XLA's algebraic simplifier strips the padding
    right back out. A/B on v5e: 11% SLOWER end to end — the barriers block
    fusion across the head boundary, costing more than the bad emitter saves.
    The models use plain narrow nn.Conv heads.
    """

    features: int
    pad_to: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", conv_init, (4, 4, x.shape[-1], self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        pad = max(self.pad_to - self.features, 0)
        # the zero block is hidden behind an optimization barrier: without it
        # XLA's algebraic simplifier rewrites slice(conv(x, pad(W))) back to
        # conv(x, W) and reinstates the degenerate narrow-channel emitter
        # this module exists to avoid (verified in the compiled HLO)
        zeros = jax.lax.optimization_barrier(
            jnp.zeros((4, 4, x.shape[-1], pad), kernel.dtype)
        )
        kp = jnp.concatenate([kernel, zeros], axis=-1)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kp.astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # second barrier: slice(conv) would otherwise be narrowed to a
        # conv-with-sliced-kernel by the simplifier, and in the backward the
        # zero-padded output cotangent would narrow the weight-grad conv the
        # same way; an opaque boundary between conv and slice keeps both the
        # forward and the weight-gradient convolutions at `pad_to` channels
        y = jax.lax.optimization_barrier(y)
        return y[..., : self.features] + bias.astype(y.dtype)


class DupOutConv(nn.Module):
    """Conv k4 s1 SAME whose output channels are DUPLICATED to a TPU-friendly
    lane count for the convolution, then averaged back.

    Second attack on the narrow-head emitter problem (see PaddedOutConv):
    the 36 -> 4 generator head and 64 -> 1 discriminator head weight-grad
    convs run degenerate T(4,128)/T(1,128) layouts at >10x their FLOP cost.
    Zero-padding the output channels needs optimization barriers (XLA's
    simplifier strips the pad) and the barriers block fusion — 11% slower.
    Duplicating instead gives the simplifier nothing to strip: the kernel is
    concatenated with itself to `dup_to` channels (all replicas live — no
    dead code, no barriers) and the replicas are averaged back. Exact:
    every replica of an output channel is computed by the same conv op from
    identical weights, and the f32 replica-sum of k identical values divided
    by a power-of-two k reproduces the value; the parameter gradient is the
    sum of k identical replica cotangents of dy/k. Parameter tree keeps the
    reference's (4, 4, cin, features) kernel + (features,) bias shapes.
    """

    features: int
    dup_to: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", conv_init, (4, 4, cin, self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        k = max(self.dup_to // self.features, 1)
        kd = jnp.concatenate([kernel] * k, axis=-1).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kd,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, h, w, _ = y.shape
        # channel order after concat is [f_0..f_{F-1}] * k -> (k, F) groups
        y = y.reshape(b, h, w, k, self.features)
        y = (jnp.sum(y.astype(jnp.float32), axis=3) * (1.0 / k)).astype(
            self.dtype
        )
        return y + bias.astype(y.dtype)


class InstanceNorm(nn.Module):
    """Per-(sample, channel) normalization over spatial dims, with learned
    scale and offset (tfa InstanceNormalization semantics)."""

    epsilon: float = INSTANCE_NORM_EPS

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        beta = self.param("offset", nn.initializers.zeros, (features,), jnp.float32)

        if x.dtype == jnp.bfloat16:
            # mixed-precision fast path: keep the elementwise passes in bf16
            # (upcasting every activation tensor to f32 costs ~12 ms/step at
            # batch 1024); statistics still accumulate in f32 via the
            # reduction dtype, using the single-pass E[x^2] - E[x]^2 form
            mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
            mean2 = jnp.mean(
                jnp.square(x), axis=(1, 2), keepdims=True, dtype=jnp.float32
            )
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            scale = (gamma * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
            offset = (beta - mean * gamma * jax.lax.rsqrt(var + self.epsilon)).astype(
                x.dtype
            )
            return x * scale + offset

        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        normed = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
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


class _SplitConcatConv(nn.Module):
    """k4 s2 SAME no-bias conv over an implicit concat([target, source]),
    computed as two half-kernel convs summed.

    conv(concat([t, s]), W) == conv(t, W[:, :, :Ct]) + conv(s, W[:, :, Ct:])
    exactly (channel contraction is a sum); splitting (a) removes the
    (B, 64, 64, 2C) concat copy and (b) makes the source-half conv an
    identical subexpression in all three D invocations of a train step
    (D(real, src), D(fake, src) twice) so XLA CSE computes it once. The
    parameter keeps the reference (4, 4, Ct+Cs, F) shape.
    """

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, target: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
        ct, cs = target.shape[-1], source.shape[-1]
        kernel = self.param(
            "kernel", conv_init, (4, 4, ct + cs, self.filters), jnp.float32
        )

        def half(v, k):
            return jax.lax.conv_general_dilated(
                v.astype(self.dtype),
                k.astype(self.dtype),
                window_strides=(2, 2),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        return half(target, kernel[:, :, :ct, :]) + half(
            source, kernel[:, :, ct:, :]
        )


class SplitInputDownBlock(nn.Module):
    """DownBlock(no-norm) over an implicit concat — see _SplitConcatConv."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, target: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
        x = _SplitConcatConv(self.filters, dtype=self.dtype, name="Conv_0")(
            target, source
        )
        return nn.leaky_relu(x, negative_slope=LEAKY_RELU_SLOPE)


class SubpixelConvTranspose(nn.Module):
    """ConvTranspose(k4, s2, SAME, no bias) as 4 phase convs + depth-to-space.

    A stride-2 transposed conv lowers in XLA to an input-dilated conv, wasting
    ~3/4 of MXU cycles multiplying inserted zeros. The same linear operator
    decomposes exactly into one k2s1 conv producing 4x the channels (one set
    per output phase (dy, dx) in {0,1}^2) followed by a pixel-shuffle — pure
    dense MXU work. Parameter count is identical (2*2*Cin*4*Cout =
    4*4*Cin*Cout) and the spanned function space is the same, so training
    behavior matches the reference's Conv2DTranspose (networks.py:26-27).
    """

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = x.shape
        c = self.filters
        # one dense k2 VALID conv over the 1-padded input gives every 2x2
        # window; output phase (ry, rx) (ry, rx in {0,1}) reads the window at
        # offset (y-1+ry, x-1+rx), i.e. a shifted (H, W) slice of the
        # (H+1, W+1) conv output, with its own filter block
        y = nn.Conv(
            4 * c,
            kernel_size=(2, 2),
            strides=(1, 1),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
        )(x)
        # k2 s1 over the (H+2)-padded rows yields H+1 windows; window i
        # covers in[i-1 : i+1]
        phases = []
        for ry in (0, 1):
            for rx in (0, 1):
                block = y[:, ry : ry + h, rx : rx + w, (2 * ry + rx) * c : (2 * ry + rx + 1) * c]
                phases.append(block)
        # interleave: out[2y+ry, 2x+rx] = phase(ry, rx)[y, x]
        stacked = jnp.stack(phases, axis=3)  # (B, H, W, 4, C)
        stacked = stacked.reshape(b, h, w, 2, 2, c)
        out = jnp.transpose(stacked, (0, 1, 3, 2, 4, 5))
        return out.reshape(b, 2 * h, 2 * w, c)


def _convt_k4s2_same(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """The exact conv flax nn.ConvTranspose(k4, s2, SAME) performs."""
    return jax.lax.conv_transpose(
        x,
        kernel,
        strides=(2, 2),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def _convt_k4s2_flipgrad(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose k4 s2 SAME whose weight-grad flips the RESULT, not g.

    XLA lowers the weight gradient of an lhs-dilated conv by spatially
    REVERSING the output cotangent — a materialized (B, 2H, 2W, C) HBM
    round-trip per UpBlock (~524 MB/step across the six blocks at batch
    1024; reverse.75-80 in the optimized HLO, ~1.5 ms/step). The same
    gradient is a plain conv with the roles rearranged,

      dW[kh,kw,i,o] = flip_kh,kw( conv(lhs=g, rhs=x, rhs_dilation=2,
                                       pad=(1,1), contract over batch) ),

    putting the reversal on the (4, 4, Cin, Cout) result (a few KB) instead
    of the activation. Forward and input-grad are unchanged. Exactness is
    pinned in tests/test_networks.py.
    """
    return _convt_k4s2_same(x, kernel)


def _convt_k4s2_flipgrad_fwd(x, kernel):
    return _convt_k4s2_same(x, kernel), (x, kernel)


def _convt_k4s2_flipgrad_bwd(res, g):
    x, kernel = res
    # input grad: the standard path (no reverse is emitted for it)
    _, vjp_x = jax.vjp(lambda xx: _convt_k4s2_same(xx, kernel), x)
    (dx,) = vjp_x(g)
    # weight grad: contract batch via dimension numbers (no materialized
    # transposes); lhs=g (batch<-C_out, feature<-B), rhs=x (out<-C_in,
    # contract<-B), output (C_out, kh, kw, C_in)
    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(3, 0, 1, 2), rhs_spec=(3, 0, 1, 2), out_spec=(0, 3, 1, 2)
    )
    cand = jax.lax.conv_general_dilated(
        g,
        x,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        rhs_dilation=(2, 2),
        dimension_numbers=dn,
    )
    dw = jnp.transpose(jnp.flip(cand, (1, 2)), (1, 2, 3, 0))
    return dx, dw.astype(kernel.dtype)


_convt_k4s2_flipgrad.defvjp(_convt_k4s2_flipgrad_fwd, _convt_k4s2_flipgrad_bwd)


class FlipGradConvTranspose(nn.Module):
    """nn.ConvTranspose(k4, s2, SAME, no bias) with the flip-on-result
    weight-grad (_convt_k4s2_flipgrad). Same parameter name/shape as
    nn.ConvTranspose so checkpoints and the TF parity shim are unchanged."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", conv_init, (4, 4, x.shape[-1], self.filters), jnp.float32
        )
        return _convt_k4s2_flipgrad(
            x.astype(self.dtype), kernel.astype(self.dtype)
        )


def _conv_k4s1_same(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """The exact conv flax nn.Conv(k4, s1, SAME) performs (sans bias)."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def _conv_k4s1_swapgrad(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Conv k4 s1 SAME whose weight-grad swaps the operand roles.

    The standard weight-grad conv makes the cotangent g the conv KERNEL, so
    the emitter's output-feature dim is C_out — for the narrow heads
    (36 -> 4, 64 -> 1) that is a degenerate T(4,128)/T(1,128) emitter that
    never reaches the MXU densely (~1.8 + 0.8 ms/step at batch 1024; the
    dup8 A/B proved padding C_out doesn't fix it). Swapping the roles —
    g as conv LHS (contracting batch as its feature dim), x as the kernel —
    makes C_in (36/64, lane-wide) the emitter's feature dim and C_out the
    conv batch dim, with the spatial flip landing on the (4, 4) RESULT:

      dW[kh,kw,i,o] = flip_kh,kw( conv(lhs=g, rhs=x, pad=(2,1),
                                       contract over batch) )

    Forward and input-grad are unchanged. Exactness pinned in
    tests/test_networks.py.
    """
    return _conv_k4s1_same(x, kernel)


def _conv_k4s1_swapgrad_fwd(x, kernel):
    return _conv_k4s1_same(x, kernel), (x, kernel)


def _conv_k4s1_swapgrad_bwd(res, g):
    x, kernel = res
    _, vjp_x = jax.vjp(lambda xx: _conv_k4s1_same(xx, kernel), x)
    (dx,) = vjp_x(g)
    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(3, 0, 1, 2), rhs_spec=(3, 0, 1, 2), out_spec=(0, 3, 1, 2)
    )
    cand = jax.lax.conv_general_dilated(
        g,
        x,
        window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=dn,
    )
    dw = jnp.transpose(jnp.flip(cand, (1, 2)), (1, 2, 3, 0))
    return dx, dw.astype(kernel.dtype)


_conv_k4s1_swapgrad.defvjp(_conv_k4s1_swapgrad_fwd, _conv_k4s1_swapgrad_bwd)


class SwapGradConv(nn.Module):
    """nn.Conv(k4, s1, SAME, bias) with the swapped-operand weight-grad
    (_conv_k4s1_swapgrad). Same param names/shapes as nn.Conv."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", conv_init, (4, 4, x.shape[-1], self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        y = _conv_k4s1_swapgrad(x.astype(self.dtype), kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)


class NCHWOutConv(nn.Module):
    """Conv k4 s1 SAME with bias whose output is REQUESTED in NCHW dim
    order (spatial-minor) and transposed back to NHWC.

    Inference-only lowering for the narrow generator head (36 -> 4,
    networks.py:95-97): in the TRAIN program XLA's layout assignment gives
    this conv a spatial-minor output layout ({2,1,3,0} tiling, lanes carry
    a spatial dim) and the efficient EmitInputBatchInLanes emitter. In an
    inference-only program (no backward; consumers are just tanh + the
    scan carry) it instead picks a channels-minor {3,0,2,1} layout and the
    degenerate EmitOutputBatchInSublanes emitter — 4/128 lanes live, XLA's
    own estimate 16.9M cycles, measured 11.4 ms of a 21 ms batch-1024
    generator forward on v5e. Asking for the conv result in NCHW puts W in
    lanes/H in sublanes regardless of what the consumers prefer; the
    transpose back to NHWC is a ~34 MB bf16 relayout that fuses with the
    tanh epilogue. Exact: same convolution, same param names/shapes.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", conv_init, (4, 4, x.shape[-1], self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NCHW"),
        )
        y = jnp.transpose(y, (0, 2, 3, 1))
        return y + bias.astype(y.dtype)


class UpBlock(nn.Module):
    """ConvTranspose k4 s2 -> InstanceNorm -> [Dropout 0.5] -> ReLU
    (networks.py:24-36).

    transpose_impl: "lax_flipgrad" (default — the measured A/B winner and
    config.py's production default: the lax forward with the weight-grad
    reverse moved off the activation, see _convt_k4s2_flipgrad), "lax"
    (plain flax ConvTranspose, for reference-lowering comparison), or
    "subpixel" (phase-decomposed, MXU-dense; exact but measured slower —
    62.1 vs 52.5 ms/step on the flagship, docs/DESIGN.md).
    """

    filters: int
    apply_dropout: bool = False
    dtype: Any = jnp.float32
    transpose_impl: str = "lax_flipgrad"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = False) -> jnp.ndarray:
        if self.transpose_impl == "subpixel":
            x = SubpixelConvTranspose(self.filters, dtype=self.dtype)(x)
        elif self.transpose_impl == "lax_flipgrad":
            x = FlipGradConvTranspose(
                self.filters, dtype=self.dtype, name="ConvTranspose_0"
            )(x)
        else:
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
    # Defaults match config.py's production defaults (the measured A/B
    # winners, docs/DESIGN.md) so a bare UnetGenerator() computes with the
    # fastest exact lowerings; "lax"/"subpixel"/"narrow"/"dup8" remain
    # selectable for comparison.
    transpose_impl: str = "lax_flipgrad"  # | "lax" | "subpixel"
    head_conv: str = "swapgrad"  # | "narrow" (plain nn.Conv) | "dup8" | "nchw"

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
            x = UpBlock(
                filters,
                apply_dropout=(i < 3),
                dtype=self.dtype,
                transpose_impl=self.transpose_impl,
            )(x, deterministic=deterministic)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)

        # NOTE: the narrow (36 -> 4) head's weight-grad conv runs a degenerate
        # T(4,128) emitter (~1.8 ms/step at batch 1024). Lane-padding behind
        # barriers (PaddedOutConv) measured 11% slower; channel DUPLICATION
        # (DupOutConv, "dup8") fixed nothing (the cost is layout-independent
        # for g-as-kernel weight grads). The adopted fix is "swapgrad":
        # swap the weight-grad conv's operand roles so wide C_in drives the
        # emitter (SwapGradConv; flagship 47.2 -> 45.4 ms device clock).
        if self.head_conv == "dup8" and self.output_channels < 8:
            x = DupOutConv(
                self.output_channels, dtype=self.dtype, name="Conv_0"
            )(x)
        elif self.head_conv == "swapgrad" and self.output_channels <= 8:
            # narrow heads only: the swap makes C_in the emitter's feature
            # dim, which would SHRINK it for the indexed 33 -> 256 head
            x = SwapGradConv(
                self.output_channels, dtype=self.dtype, name="Conv_0"
            )(x)
        elif self.head_conv == "nchw" and self.output_channels <= 8:
            # inference-only lowering (config.infer_head_conv); see
            # NCHWOutConv for the emitter story. Narrow heads only: the
            # indexed 33 -> 256 head already fills the lanes channels-minor
            x = NCHWOutConv(
                self.output_channels, dtype=self.dtype, name="Conv_0"
            )(x)
        else:
            x = nn.Conv(
                self.output_channels,
                kernel_size=(4, 4),
                padding="SAME",
                use_bias=True,
                kernel_init=conv_init,
                dtype=self.dtype,
            )(x)
        if self.last_activation == "linear":
            # raw logits stay in the compute dtype: an f32 upcast here adds
            # no information (consumers upcast pointwise before reducing —
            # losses/argmax are bit-identical) but would materialize a 2x
            # larger tensor; at (B, 64, 64, 256) that is real HBM traffic
            return x
        x = x.astype(jnp.float32)
        if self.last_activation == "tanh":
            x = jnp.tanh(x)
        elif self.last_activation == "softmax":
            x = nn.softmax(x, axis=-1)
        else:
            raise ValueError(f"unknown activation {self.last_activation!r}")
        return x


class PatchDiscriminator(nn.Module):
    """Shallow PatchGAN: one downsample then a 1-channel conv head
    (networks.py:39-50). Output: (B, 32, 32, 1) patch logits."""

    input_channels: int = 4
    dtype: Any = jnp.float32
    # production default, matching config.py (see UnetGenerator head note)
    head_conv: str = "swapgrad"  # | "narrow" | "dup8" | "nchw"
    input_split: bool = False  # split-concat first conv (see _SplitConcatConv)

    @nn.compact
    def __call__(self, target: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
        if self.input_split:
            # implicit concat([target, source]) via half-kernel convs; the
            # channel order matches networks.py:45 ([target, source])
            x = SplitInputDownBlock(64, dtype=self.dtype, name="DownBlock_0")(
                target, source
            )
        else:
            # concat order is [target, source] (networks.py:45)
            x = jnp.concatenate(
                [target.astype(self.dtype), source.astype(self.dtype)], axis=-1
            )
            x = DownBlock(64, apply_norm=False, dtype=self.dtype)(x)
        # narrow 64 -> 1 head by default: see the UnetGenerator head note
        if self.head_conv == "dup8":
            x = DupOutConv(1, dtype=self.dtype, name="Conv_0")(x)
        elif self.head_conv == "swapgrad":
            x = SwapGradConv(1, dtype=self.dtype, name="Conv_0")(x)
        elif self.head_conv == "nchw":
            # inference-only lowering (see NCHWOutConv)
            x = NCHWOutConv(1, dtype=self.dtype, name="Conv_0")(x)
        else:
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
        down_filters=tuple(getattr(config, "down_filters", (64, 128, 256, 512, 512, 512))),
        up_filters=tuple(getattr(config, "up_filters", (512, 512, 256, 128, 64, 32))),
        transpose_impl=getattr(config, "transpose_impl", "lax_flipgrad"),
        head_conv=getattr(config, "head_conv", "swapgrad"),
    )


def build_discriminator(config) -> PatchDiscriminator:
    """Discriminator for a config (pix2pix_model.py:41-42, :270-271)."""
    return PatchDiscriminator(
        input_channels=config.discriminator_in_channels,
        dtype=jnp.dtype(config.compute_dtype),
        head_conv=getattr(config, "head_conv", "swapgrad"),
        input_split=getattr(config, "d_input_split", False),
    )
