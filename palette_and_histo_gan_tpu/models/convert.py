"""Import trained reference (keras) network weights into the Flax networks.

The reference trains keras models (/root/reference/networks.py:39-98) and
saves them as keras SavedModels (/root/reference/side2side_model.py:178-200
— ``models/py/{generator,discriminator}/<arch>/<model>``). A user migrating
from the reference brings those trained weights over in two steps:

1. In the ORIGINAL environment (TF 2.9 + tensorflow_addons — keras 3 cannot
   read TF-2.9 SavedModels, so the export has to happen where the model
   loads), dump the weights to a portable .npz::

       import numpy as np, tensorflow as tf
       import tensorflow_addons  # registers InstanceNormalization
       model = tf.keras.models.load_model(
           "models/py/generator/front-to-right/baseline", compile=False)
       np.savez("generator.npz", *model.get_weights())

2. Here, convert to a Flax param tree::

       python scripts/convert_reference_weights.py \
           --generator generator.npz --variant baseline --out gen_flax.npz

``model.get_weights()`` on the reference's functional models enumerates
variables in construction order, which for these fixed topologies is fully
deterministic:

* U-Net generator (networks.py:53-98): the six ``unet_downsample``
  Sequentials (Conv2D kernel, then for all but the first InstanceNorm
  gamma + beta), the six ``unet_upsample`` Sequentials (Conv2DTranspose
  kernel, gamma, beta), then the head Conv2D (kernel, bias).
* PatchGAN discriminator (networks.py:39-50): one no-norm downsample
  (Conv2D kernel), then the head Conv2D (kernel, bias).

Layout contract (probed empirically against keras layers; pinned
functionally by tests/test_parity.py's golden fixtures, which build their
Flax trees through this module):

* keras Conv2D kernels are (kh, kw, cin, cout) — identical to flax
  ``nn.Conv``; copied as-is.
* keras Conv2DTranspose kernels are (kh, kw, cout, cin); the flax
  ``nn.ConvTranspose`` (``transpose_kernel=False``) kernel computing the
  same function is ``transpose(k[::-1, ::-1], (0, 1, 3, 2))`` (spatial
  flip + channel-axis swap).
* tfa ``InstanceNormalization`` gamma/beta map to ``InstanceNorm``
  scale/offset (same per-channel affine, eps 1e-3 on both sides).
"""

from __future__ import annotations

import re
from typing import Sequence

import numpy as np

# Reference U-Net stage widths (/root/reference/networks.py:57-73).
DOWN_FILTERS = (64, 128, 256, 512, 512, 512)
UP_FILTERS = (512, 512, 256, 128, 64, 32)


def generator_weight_spec(in_channels: int, out_channels: int):
    """Ordered (name, shape, kind) of the reference U-Net's weights, in
    ``model.get_weights()`` order, with keras kernel layouts.

    Kinds: "conv" (Conv2D/Conv2DTranspose kernel), "scale"/"offset"
    (InstanceNorm gamma/beta), "bias" (head conv bias).
    """
    spec = []
    cin = in_channels
    for i, f in enumerate(DOWN_FILTERS):
        spec.append((f"gen/down{i}/conv", (4, 4, cin, f), "conv"))
        if i != 0:  # first downsample has apply_batchnorm=False
            spec.append((f"gen/down{i}/norm/scale", (f,), "scale"))
            spec.append((f"gen/down{i}/norm/offset", (f,), "offset"))
        cin = f
    # Decoder input widths: bottleneck 512, then concat(up_i, skip_i);
    # the last "skip" is the raw network input (networks.py:92).
    skip_widths = list(reversed(DOWN_FILTERS[:-1])) + [in_channels]
    for i, f in enumerate(UP_FILTERS):
        # keras Conv2DTranspose kernel layout: (kh, kw, cout, cin)
        spec.append((f"gen/up{i}/convt", (4, 4, f, cin), "conv"))
        spec.append((f"gen/up{i}/norm/scale", (f,), "scale"))
        spec.append((f"gen/up{i}/norm/offset", (f,), "offset"))
        cin = f + skip_widths[i]
    spec.append(("gen/head/conv", (4, 4, cin, out_channels), "conv"))
    spec.append(("gen/head/bias", (out_channels,), "bias"))
    return spec


def discriminator_weight_spec(in_channels: int):
    """Ordered (name, shape, kind) for the PatchGAN (networks.py:39-50)."""
    return [
        ("disc/down/conv", (4, 4, 2 * in_channels, 64), "conv"),
        ("disc/head/conv", (4, 4, 64, 1), "conv"),
        ("disc/head/bias", (1,), "bias"),
    ]


def _named_from_sequence(arrays: Sequence[np.ndarray], spec, what: str):
    """Zip a get_weights()-ordered array list against a spec, validating
    count and shapes with errors that say which weight disagreed."""
    if len(arrays) != len(spec):
        raise ValueError(
            f"{what}: expected {len(spec)} weight arrays "
            f"(reference topology), got {len(arrays)}. Was the .npz saved "
            f"with np.savez(path, *model.get_weights()) from the reference "
            f"model, and do --in-channels/--out-channels (or --variant) "
            f"match the trained variant?"
        )
    named = {}
    for arr, (name, shape, _) in zip(arrays, spec):
        arr = np.asarray(arr)
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(
                f"{what}: weight '{name}' has shape {tuple(arr.shape)}, "
                f"expected {tuple(shape)}. The array order or the variant's "
                f"channel counts do not match the reference topology."
            )
        named[name] = arr.astype(np.float32)
    return named


def generator_tree_from_named(named: dict) -> dict:
    """Build the Flax UnetGenerator param tree from canonical-named keras
    arrays (the inverse of tests/parity_utils.flax_generator_grads_to_tf)."""
    tree = {}
    for i in range(len(DOWN_FILTERS)):
        block = {"Conv_0": {"kernel": named[f"gen/down{i}/conv"]}}
        if i != 0:
            block["InstanceNorm_0"] = {
                "scale": named[f"gen/down{i}/norm/scale"],
                "offset": named[f"gen/down{i}/norm/offset"],
            }
        tree[f"DownBlock_{i}"] = block
    for i in range(len(UP_FILTERS)):
        k_tf = named[f"gen/up{i}/convt"]
        k_flax = np.transpose(k_tf[::-1, ::-1], (0, 1, 3, 2)).copy()
        tree[f"UpBlock_{i}"] = {
            "ConvTranspose_0": {"kernel": k_flax},
            "InstanceNorm_0": {
                "scale": named[f"gen/up{i}/norm/scale"],
                "offset": named[f"gen/up{i}/norm/offset"],
            },
        }
    tree["Conv_0"] = {
        "kernel": named["gen/head/conv"],
        "bias": named["gen/head/bias"],
    }
    return tree


def discriminator_tree_from_named(named: dict) -> dict:
    return {
        "DownBlock_0": {"Conv_0": {"kernel": named["disc/down/conv"]}},
        "Conv_0": {
            "kernel": named["disc/head/conv"],
            "bias": named["disc/head/bias"],
        },
    }


def keras_generator_weights_to_flax(
    arrays: Sequence[np.ndarray], in_channels: int, out_channels: int
) -> dict:
    """get_weights()-ordered arrays -> Flax UnetGenerator param tree."""
    spec = generator_weight_spec(in_channels, out_channels)
    return generator_tree_from_named(
        _named_from_sequence(arrays, spec, "generator")
    )


def keras_discriminator_weights_to_flax(
    arrays: Sequence[np.ndarray], in_channels: int
) -> dict:
    """get_weights()-ordered arrays -> Flax PatchDiscriminator param tree."""
    spec = discriminator_weight_spec(in_channels)
    return discriminator_tree_from_named(
        _named_from_sequence(arrays, spec, "discriminator")
    )


def load_keras_npz(path: str) -> list:
    """Load a ``np.savez(path, *model.get_weights())`` archive, restoring
    the positional order (np.savez names positional args arr_0..arr_N)."""
    with np.load(path) as f:
        keys = list(f.files)
        if not all(re.fullmatch(r"arr_\d+", k) for k in keys):
            raise ValueError(
                f"{path}: expected positional keys arr_0..arr_N from "
                f"np.savez(path, *model.get_weights()); found {keys[:5]}..."
            )
        keys.sort(key=lambda k: int(k[4:]))
        return [f[k] for k in keys]


def save_params_npz(path: str, params: dict) -> None:
    """Save a Flax param tree as an .npz with '/'-joined keys."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    """Inverse of save_params_npz: '/'-joined .npz -> nested param tree."""
    tree: dict = {}
    with np.load(path) as f:
        for key in f.files:
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = f[key]
    return tree
