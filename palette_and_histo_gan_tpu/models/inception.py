"""InceptionV3 feature extractor in Flax, for on-TPU FID.

Rebuild of the keras InceptionV3(include_top=False, pooling="avg") singleton
the reference constructs at import time (frechet_inception_distance.py:76).
Architecture follows the canonical InceptionV3 (Szegedy et al. 2015) as
instantiated by keras.applications: conv+BN(no scale)+relu units, mixed0-10
blocks, global average pooling to 2048 features.

Weights: pretrained ImageNet weights cannot be downloaded in this offline
environment. `load_params` initializes deterministically from a PRNG key; if
a keras-layout .npz of pretrained weights is provided (see
`convert_keras_weights`), those are used instead, making the FID numerically
comparable to the reference. The FID *statistics* machinery is weight-
agnostic and fully parity-tested (tests/test_fid.py).
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

FEATURE_DIM = 2048


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm (no scale, eps 1e-3) + ReLU, keras conv2d_bn."""

    filters: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.filters,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            # He init keeps activation variance alive through ~94 relu layers,
            # so the random-init fallback still yields discriminative features
            # (pretrained weights overwrite this when available)
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype,
            # fp32-accurate convs: the TPU default is bf16-grade MXU passes,
            # whose ~1e-3 relative quantization noise swamps the sample-
            # dependent feature signal under the reference's FID quirk chain
            # (inputs live in [-1.008, -0.984], so features are ~99.9%
            # constant — measured: the TPU-vs-CPU chain disagreed 5.7x on
            # identical inputs before this pin). FID is off the training hot
            # path; the cost is invisible end to end.
            precision=jax.lax.Precision.HIGHEST,
        )(x)
        # inference-only: BN folds to a per-channel affine using stored stats
        features = x.shape[-1]
        mean = self.param("mean", nn.initializers.zeros, (features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (features,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (features,), jnp.float32)
        x = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-3) + beta
        return nn.relu(x).astype(self.dtype)


def _maxpool(x, window=3, stride=2, padding="VALID"):
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=padding)


def _avgpool(x, window=3, stride=1, padding="SAME"):
    # count_include_pad=False: TF/keras AveragePooling2D with SAME padding
    # divides by the number of *valid* (unpadded) window elements; flax's
    # default of True divides by the full window size and diverges on borders
    return nn.avg_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=padding,
        count_include_pad=False,
    )


class InceptionV3(nn.Module):
    """Pool-3 (2048-d pooled) feature extractor."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        # stem
        x = ConvBN(32, (3, 3), (2, 2), "VALID", d)(x)
        x = ConvBN(32, (3, 3), padding="VALID", dtype=d)(x)
        x = ConvBN(64, (3, 3), dtype=d)(x)
        x = _maxpool(x)
        x = ConvBN(80, (1, 1), padding="VALID", dtype=d)(x)
        x = ConvBN(192, (3, 3), padding="VALID", dtype=d)(x)
        x = _maxpool(x)

        # mixed 0-2: 35x35 blocks
        for pool_proj in (32, 64, 64):
            b1 = ConvBN(64, (1, 1), dtype=d)(x)
            b5 = ConvBN(48, (1, 1), dtype=d)(x)
            b5 = ConvBN(64, (5, 5), dtype=d)(b5)
            b3 = ConvBN(64, (1, 1), dtype=d)(x)
            b3 = ConvBN(96, (3, 3), dtype=d)(b3)
            b3 = ConvBN(96, (3, 3), dtype=d)(b3)
            bp = ConvBN(pool_proj, (1, 1), dtype=d)(_avgpool(x))
            x = jnp.concatenate([b1, b5, b3, bp], axis=-1)

        # mixed 3: reduction to 17x17
        b3 = ConvBN(384, (3, 3), (2, 2), "VALID", d)(x)
        bd = ConvBN(64, (1, 1), dtype=d)(x)
        bd = ConvBN(96, (3, 3), dtype=d)(bd)
        bd = ConvBN(96, (3, 3), (2, 2), "VALID", d)(bd)
        x = jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)

        # mixed 4-7: 17x17 blocks with factorized 7x7
        for width in (128, 160, 160, 192):
            b1 = ConvBN(192, (1, 1), dtype=d)(x)
            b7 = ConvBN(width, (1, 1), dtype=d)(x)
            b7 = ConvBN(width, (1, 7), dtype=d)(b7)
            b7 = ConvBN(192, (7, 1), dtype=d)(b7)
            bd = ConvBN(width, (1, 1), dtype=d)(x)
            bd = ConvBN(width, (7, 1), dtype=d)(bd)
            bd = ConvBN(width, (1, 7), dtype=d)(bd)
            bd = ConvBN(width, (7, 1), dtype=d)(bd)
            bd = ConvBN(192, (1, 7), dtype=d)(bd)
            bp = ConvBN(192, (1, 1), dtype=d)(_avgpool(x))
            x = jnp.concatenate([b1, b7, bd, bp], axis=-1)

        # mixed 8: reduction to 8x8
        b3 = ConvBN(192, (1, 1), dtype=d)(x)
        b3 = ConvBN(320, (3, 3), (2, 2), "VALID", d)(b3)
        b7 = ConvBN(192, (1, 1), dtype=d)(x)
        b7 = ConvBN(192, (1, 7), dtype=d)(b7)
        b7 = ConvBN(192, (7, 1), dtype=d)(b7)
        b7 = ConvBN(192, (3, 3), (2, 2), "VALID", d)(b7)
        x = jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)

        # mixed 9-10: 8x8 blocks with split branches
        for _ in range(2):
            b1 = ConvBN(320, (1, 1), dtype=d)(x)
            b3 = ConvBN(384, (1, 1), dtype=d)(x)
            b3a = ConvBN(384, (1, 3), dtype=d)(b3)
            b3b = ConvBN(384, (3, 1), dtype=d)(b3)
            b3 = jnp.concatenate([b3a, b3b], axis=-1)
            bd = ConvBN(448, (1, 1), dtype=d)(x)
            bd = ConvBN(384, (3, 3), dtype=d)(bd)
            bda = ConvBN(384, (1, 3), dtype=d)(bd)
            bdb = ConvBN(384, (3, 1), dtype=d)(bd)
            bd = jnp.concatenate([bda, bdb], axis=-1)
            bp = ConvBN(192, (1, 1), dtype=d)(_avgpool(x))
            x = jnp.concatenate([b1, b3, bd, bp], axis=-1)

        # global average pooling -> (B, 2048)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


_WEIGHTS_ENV = "PHG_INCEPTION_WEIGHTS"


def load_params(rng: jax.Array | None = None, input_size: int = 299):
    """InceptionV3 params: pretrained if a weights file is available, else a
    deterministic random init (documented: offline environment, no egress)."""
    model = InceptionV3()
    weights_path = os.environ.get(_WEIGHTS_ENV, "")
    if weights_path and os.path.exists(weights_path):
        return model, _params_from_npz(model, weights_path, input_size)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    variables = model.init(rng, dummy)
    return model, variables


NUM_CONVBN = 94  # conv2d_bn units in keras InceptionV3 (stem 5 + mixed0-10)


def params_from_flat(model, flat: dict, input_size: int = 299):
    """Build the model's variables pytree from a flat {path: array} dict whose
    keys are '/'-joined Flax param paths (as produced by
    `convert_keras_model`). Every leaf must be present with matching shape."""
    dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), dummy)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(variables)
    out = []
    for keypath, leaf in leaves:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        if name not in flat:
            raise KeyError(f"missing weight {name}")
        arr = jnp.asarray(flat[name], dtype=leaf.dtype)
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch for {name}: {arr.shape} vs {leaf.shape}")
        out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out)


def _params_from_npz(model, path: str, input_size: int):
    return params_from_flat(model, dict(np.load(path)), input_size)


def _layers_in_creation_order(keras_model, cls_name: str) -> list:
    """Layers of one class sorted by the numeric suffix keras appends at
    creation time ('conv2d', 'conv2d_1', ... — monotone in creation order even
    when the session's name counters started above zero)."""
    import re

    layers = [l for l in keras_model.layers if l.__class__.__name__ == cls_name]

    def creation_index(layer):
        m = re.search(r"_(\d+)$", layer.name)
        return int(m.group(1)) if m else -1

    return sorted(layers, key=creation_index)


def convert_keras_model(keras_model) -> dict:
    """Name-based weight conversion from a live keras InceptionV3
    (include_top=False) to the flat Flax param layout of `params_from_flat`.

    keras' inception_v3.conv2d_bn creates each Conv2D and its
    BatchNormalization together, in source-text call order — the same order
    this module's `InceptionV3.__call__` instantiates its ConvBN submodules.
    So the k-th *created* keras Conv2D/BN pair is exactly flax `ConvBN_k`.
    Matching is by creation index parsed from layer names (never by zip over
    alphabetically-sorted path lists, where 'ConvBN_10' < 'ConvBN_2').
    Full-network feature parity is asserted in tests/test_fid.py.
    """
    conv_layers = _layers_in_creation_order(keras_model, "Conv2D")
    bn_layers = _layers_in_creation_order(keras_model, "BatchNormalization")
    if len(conv_layers) != NUM_CONVBN or len(bn_layers) != NUM_CONVBN:
        raise ValueError(
            f"expected {NUM_CONVBN} Conv2D/BatchNormalization pairs, got "
            f"{len(conv_layers)}/{len(bn_layers)} — not a notop InceptionV3?"
        )
    flat = {}
    for k, (cl, bl) in enumerate(zip(conv_layers, bn_layers)):
        prefix = f"params/ConvBN_{k}"
        (kernel,) = cl.get_weights()  # use_bias=False in conv2d_bn
        # BN has scale=False, center=True: weights are [beta, mean, variance]
        beta, mean, var = bl.get_weights()
        if kernel.shape[-1] != beta.shape[0]:
            raise ValueError(
                f"conv/bn channel mismatch at unit {k}: {cl.name} vs {bl.name}"
            )
        flat[f"{prefix}/Conv_0/kernel"] = kernel
        flat[f"{prefix}/beta"] = beta
        flat[f"{prefix}/mean"] = mean
        flat[f"{prefix}/var"] = var
    return flat


def convert_keras_weights(h5_path: str, out_npz: str) -> None:
    """Convert keras InceptionV3 notop weights (.h5) into the .npz layout
    consumed by `load_params`. Requires TF at conversion time; meant to run
    once, offline, wherever the keras weights file exists."""
    import tensorflow as tf  # conversion-time only

    keras_model = tf.keras.applications.InceptionV3(
        include_top=False, pooling="avg", weights=h5_path
    )
    np.savez(out_npz, **convert_keras_model(keras_model))
