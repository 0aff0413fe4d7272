"""Analytic FLOP counts for the train step, per variant.

XLA's `compiled.cost_analysis()` undercounts on this TPU backend —
convolutions lower to custom calls whose FLOPs aren't attributed (measured
119 MFLOP/image for the baseline step vs ~1.3 GFLOP analytic) — so MFU is
derived from first principles here. Counted: MXU work (conv and histogram
matmul MACs x2). Elementwise/VPU work (kernel chains, InstanceNorm,
activations) is NOT counted, matching the usual MFU convention, so the
numbers below are conservative utilization lower bounds.

Conventions:
  - conv fwd FLOPs = 2 * H_out * W_out * Cout * Cin * K_h * K_w (per sample)
  - convT(k4, s2) touches K^2/s^2 = 4 effective taps per output pixel
  - backward = input-grad conv (= fwd FLOPs) + weight-grad conv (= fwd
    FLOPs), so fwd+bwd = 3x fwd for layers that need both
"""

from __future__ import annotations

IMG = 64  # reference image side (configuration.py:23)


def _generator_fwd_flops(config) -> float:
    down = list(getattr(config, "down_filters", (64, 128, 256, 512, 512, 512)))
    up = list(getattr(config, "up_filters", (512, 512, 256, 128, 64, 32)))
    total = 0.0
    cin = config.generator_in_channels
    side = IMG
    skips = []
    # encoder: Conv k4 s2
    for cout in down:
        side //= 2
        total += 2.0 * side * side * cout * cin * 16
        skips.append(cout)
        cin = cout
    # decoder: ConvTranspose k4 s2 = 4 effective taps/output px, with skip
    # concats widening the input (input-as-last-skip on the final block)
    skip_sources = list(reversed(skips[:-1])) + [config.generator_in_channels]
    for cout, skip in zip(up, skip_sources):
        side *= 2
        total += 2.0 * side * side * cout * cin * 4
        cin = cout + skip
    # head conv k4 s1 (real channels only; lane padding is not useful work)
    total += 2.0 * side * side * config.generator_out_channels * cin * 16
    return total


def _discriminator_fwd_flops(config) -> float:
    cin = 2 * config.discriminator_in_channels  # concat([target, source])
    side = IMG // 2
    total = 2.0 * side * side * 64 * cin * 16  # DownBlock k4 s2
    total += 2.0 * side * side * 1 * 64 * 16  # 1-channel patch head k4 s1
    return total


def _histogram_dot_flops(config) -> float:
    """MXU dots of one histogram evaluation of one image."""
    hw = IMG * IMG
    s = config.histogram_size
    return 3 * 2.0 * s * s * hw  # three (size, HW) @ (HW, size) planes


def train_step_flops_per_image(config) -> float:
    """Analytic MXU FLOPs of one optimization step, per image."""
    g_fwd = _generator_fwd_flops(config)
    d_fwd = _discriminator_fwd_flops(config)
    # G: fwd + input-grad + weight-grad
    total = 3.0 * g_fwd
    # D forward passes: fake (G loss), real + fake (D loss)
    total += 3.0 * d_fwd
    # G loss backward through D: one input-grad conv pass; D loss backward:
    # weight-grad conv passes for BOTH its forward evaluations (real and
    # fake) = 2 more. The indexed variant's argmax blocks the adversarial
    # gradient, so its D input-grad chain is dead code (XLA removes it),
    # leaving only the 2 weight-grad passes.
    total += 2.0 * d_fwd if config.is_indexed else 3.0 * d_fwd
    if config.model == "histogram":
        hist = _histogram_dot_flops(config)
        # real: fwd; fake: fwd + backward (three dots per channel in the
        # fused VJP vs two MXU passes of fwd) ~= 1.5x fwd
        total += hist * (1.0 + 1.0 + 1.5)
    return total
