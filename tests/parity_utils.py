"""Shared deterministic weight generation for TF<->Flax network parity.

The network-parity fixtures (tests/golden/networks_*.npz) pin the TF-built
reference U-Net / PatchGAN forward outputs and train-step loss values
(/root/reference/networks.py:7-98, pix2pix_model.py:44-56) against the Flax
networks. Shipping the full 29.3M-param weight arrays in git would cost
~120 MB, so instead BOTH sides regenerate every weight deterministically
from its canonical name: scripts/make_golden_networks.py (TF 2.21) assigns
them into keras models and records only inputs + outputs + losses; the test
(tests/test_parity.py) assigns the identical arrays into the Flax param tree
and compares.

Weight layout contract (probed empirically, /tmp parity probe, 2026-08-17):
  - Conv2D k4 SAME: keras kernel (kh, kw, cin, cout) == flax nn.Conv kernel;
    forward is bit-exact between tf.nn.conv2d and lax.conv_general_dilated.
  - Conv2DTranspose k4 s2 SAME: keras kernel is (kh, kw, cout, cin); the
    flax nn.ConvTranspose (transpose_kernel=False) kernel that computes the
    same function is  K_flax = transpose(K_tf[::-1, ::-1], (0, 1, 3, 2))
    (spatial flip + channel-axis swap), max |diff| ~1e-6 at these scales.
  - tfa InstanceNormalization == per-(sample, channel) mean/var over (H, W),
    eps 1e-3, learned per-channel gamma/beta.
"""

from __future__ import annotations

import zlib

import numpy as np

from palette_and_histo_gan_tpu.models import convert

# topology constants per /root/reference/networks.py:57-73
DOWN_FILTERS = convert.DOWN_FILTERS
UP_FILTERS = convert.UP_FILTERS


def make_param(name: str, shape, kind: str) -> np.ndarray:
    """Deterministic pseudo-random parameter, keyed only by canonical name.

    Kinds: "conv"/"bias" ~ N(0, 0.02) (the reference init scale,
    networks.py:7), "scale" ~ N(1, 0.05), "offset" ~ N(0, 0.05) — the norm
    params are perturbed away from their (1, 0) init so the parity test
    actually exercises gamma/beta application.
    """
    rng = np.random.default_rng(zlib.crc32(name.encode("utf-8")))
    if kind in ("conv", "bias"):
        return rng.normal(0.0, 0.02, size=shape).astype(np.float32)
    if kind == "scale":
        return rng.normal(1.0, 0.05, size=shape).astype(np.float32)
    if kind == "offset":
        return rng.normal(0.0, 0.05, size=shape).astype(np.float32)
    raise ValueError(kind)


# Specs live in the public converter (models/convert.py) — the golden
# parity tests build their Flax trees through it, so passing fixtures pin
# the user-facing keras->Flax weight-conversion path too.
generator_param_spec = convert.generator_weight_spec
discriminator_param_spec = convert.discriminator_weight_spec


def materialize(spec) -> dict:
    return {name: make_param(name, shape, kind) for name, shape, kind in spec}


def flax_generator_params(in_channels: int, out_channels: int) -> dict:
    """The Flax UnetGenerator (transpose_impl="lax") param tree holding the
    same function as the keras model built from generator_param_spec."""
    w = materialize(generator_param_spec(in_channels, out_channels))
    return convert.generator_tree_from_named(w)


def flax_discriminator_params(in_channels: int) -> dict:
    w = materialize(discriminator_param_spec(in_channels))
    return convert.discriminator_tree_from_named(w)


N_GRAD_PROJECTIONS = 8


def projection_vector(name: str, size: int, j: int) -> np.ndarray:
    """Deterministic unit vector keyed by (canonical name, index) — the
    random directions onto which large gradient tensors are projected for
    the parity pins. Regenerated identically by the fixture writer
    (scripts/make_golden_networks.py) and the test (tests/test_parity.py),
    so the fixture stores only the projected scalars."""
    rng = np.random.default_rng(zlib.crc32(f"{name}#proj{j}".encode("utf-8")))
    v = rng.standard_normal(size)
    return v / np.linalg.norm(v)


def grad_projections(name: str, grad, k: int = N_GRAD_PROJECTIONS) -> np.ndarray:
    """k fixed random projections <grad, p_j> in float64. A structured error
    of norm eps*||g|| shifts each projection by ~eps*||g||/sqrt(n) =
    eps*rms(g) in typical position, so checking the k scalars at a small
    multiple of rms(g) bounds structured errors the L2-norm pin alone
    cannot see (two tensors can share a norm while differing by an
    arbitrary rotation)."""
    g64 = np.asarray(grad, np.float64).ravel()
    return np.array(
        [g64 @ projection_vector(name, g64.size, j) for j in range(k)],
        np.float64,
    )


def parity_input(name: str, shape) -> np.ndarray:
    """Deterministic input batch in [-1, 1] (the nets' operating range)."""
    rng = np.random.default_rng(zlib.crc32(name.encode("utf-8")))
    return rng.uniform(-1.0, 1.0, size=shape).astype(np.float32)


# Full gradient/delta tensors are pinned whole for variables at or under
# this many elements (norm params, biases, the small conv kernels); every
# variable gets its L2 norm pinned, and larger ones get the random
# projections. Shipping all 29.3M full gradients would cost ~120 MB like
# the weights would.
GRAD_FULL_MAX_ELEMS = 8192


def grad_fixture_arrays(grads: dict, prefix: str) -> dict:
    """Per-variable pins for a dict of gradient/delta arrays: L2 norm for
    every var, the full tensor for small vars, and N_GRAD_PROJECTIONS fixed
    random projections for the large vars (deterministic directions
    regenerated by both sides from the canonical name, projection_vector) —
    a norm alone cannot see a rotation-like structured error; the
    projections can. Canonical names are slash-separated; npz keys use '.'
    (npz keys cannot contain '/'... they can, but keep them readable).
    Used by scripts/make_golden_networks.py and
    scripts/make_golden_trajectory.py; the matching reader is
    tests/test_parity.py::_assert_grads_match."""
    out = {}
    for name, g in grads.items():
        g = np.asarray(g, np.float32)
        key = name.replace("/", ".")
        out[f"{prefix}norm.{key}"] = np.float32(
            np.linalg.norm(g.astype(np.float64))
        )
        if g.size <= GRAD_FULL_MAX_ELEMS:
            out[f"{prefix}full.{key}"] = g
        else:
            out[f"{prefix}proj.{key}"] = grad_projections(name, g)
    return out


def flax_generator_grads_to_tf(tree) -> dict:
    """Map a Flax UnetGenerator gradient tree back to canonical TF-layout
    names (the inverse walk of flax_generator_params).

    The ConvTranspose kernel map W_flax = transpose(W_tf[::-1, ::-1],
    (0, 1, 3, 2)) is an orthogonal permutation of the entries, so gradients
    map through the same permutation inverted:
    G_tf = transpose(G_flax, (0, 1, 3, 2))[::-1, ::-1] (the flip acts on
    spatial axes and the transpose on channel axes, so they commute)."""
    out = {}
    for i in range(len(DOWN_FILTERS)):
        block = tree[f"DownBlock_{i}"]
        out[f"gen/down{i}/conv"] = np.asarray(block["Conv_0"]["kernel"])
        if i != 0:
            out[f"gen/down{i}/norm/scale"] = np.asarray(
                block["InstanceNorm_0"]["scale"]
            )
            out[f"gen/down{i}/norm/offset"] = np.asarray(
                block["InstanceNorm_0"]["offset"]
            )
    for i in range(len(UP_FILTERS)):
        block = tree[f"UpBlock_{i}"]
        g_flax = np.asarray(block["ConvTranspose_0"]["kernel"])
        out[f"gen/up{i}/convt"] = np.ascontiguousarray(
            np.transpose(g_flax, (0, 1, 3, 2))[::-1, ::-1]
        )
        out[f"gen/up{i}/norm/scale"] = np.asarray(block["InstanceNorm_0"]["scale"])
        out[f"gen/up{i}/norm/offset"] = np.asarray(
            block["InstanceNorm_0"]["offset"]
        )
    out["gen/head/conv"] = np.asarray(tree["Conv_0"]["kernel"])
    out["gen/head/bias"] = np.asarray(tree["Conv_0"]["bias"])
    return out


def flax_discriminator_grads_to_tf(tree) -> dict:
    return {
        "disc/down/conv": np.asarray(tree["DownBlock_0"]["Conv_0"]["kernel"]),
        "disc/head/conv": np.asarray(tree["Conv_0"]["kernel"]),
        "disc/head/bias": np.asarray(tree["Conv_0"]["bias"]),
    }
