"""Reference keras-weight import (models/convert.py).

The mapping math itself (conv layouts, convT flip+swap, InstanceNorm
gamma/beta) is pinned functionally by the golden parity tests — both sides
of tests/test_parity.py build their Flax trees through convert. These tests
cover the user-facing surface on top of that: get_weights()-ordered
sequences, the .npz round trips, validation errors, and an end-to-end
forward through a converted tree against the TF-computed golden output.
"""

import os

import numpy as np
import pytest

from tests import parity_utils as pu
from palette_and_histo_gan_tpu.models import convert

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _ordered_arrays(spec):
    """Deterministic weights in get_weights() order (parity_utils names)."""
    return [pu.make_param(name, shape, kind) for name, shape, kind in spec]


def _tree_equal(a, b):
    assert a.keys() == b.keys()
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k])
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


class TestMapping:
    def test_generator_sequence_matches_parity_tree(self):
        spec = convert.generator_weight_spec(4, 4)
        tree = convert.keras_generator_weights_to_flax(
            _ordered_arrays(spec), 4, 4
        )
        _tree_equal(tree, pu.flax_generator_params(4, 4))

    def test_indexed_generator_spec(self):
        # indexed variant: 1 input channel, 256-way softmax head
        spec = convert.generator_weight_spec(1, 256)
        assert spec[0][1] == (4, 4, 1, 64)
        assert spec[-2][1] == (4, 4, 32 + 1, 256)  # head sees concat(32, input)
        assert spec[-1][1] == (256,)
        tree = convert.keras_generator_weights_to_flax(
            _ordered_arrays(spec), 1, 256
        )
        _tree_equal(tree, pu.flax_generator_params(1, 256))

    def test_discriminator_sequence_matches_parity_tree(self):
        spec = convert.discriminator_weight_spec(4)
        tree = convert.keras_discriminator_weights_to_flax(
            _ordered_arrays(spec), 4
        )
        _tree_equal(tree, pu.flax_discriminator_params(4))

    def test_wrong_count_raises(self):
        spec = convert.generator_weight_spec(4, 4)
        arrays = _ordered_arrays(spec)[:-1]
        with pytest.raises(ValueError, match="expected .* weight arrays"):
            convert.keras_generator_weights_to_flax(arrays, 4, 4)

    def test_wrong_shape_names_the_weight(self):
        spec = convert.generator_weight_spec(4, 4)
        arrays = _ordered_arrays(spec)
        arrays[0] = arrays[0][:, :, :3, :]  # wrong cin
        with pytest.raises(ValueError, match="gen/down0/conv"):
            convert.keras_generator_weights_to_flax(arrays, 4, 4)


class TestNpz:
    def test_keras_npz_round_trip_order(self, tmp_path):
        spec = convert.discriminator_weight_spec(4)
        arrays = _ordered_arrays(spec)
        path = str(tmp_path / "disc.npz")
        np.savez(path, *arrays)  # exactly the documented user-side export
        loaded = convert.load_keras_npz(path)
        assert len(loaded) == len(arrays)
        for a, b in zip(arrays, loaded):
            np.testing.assert_array_equal(a, b)

    def test_keras_npz_rejects_named_keys(self, tmp_path):
        path = str(tmp_path / "bad.npz")
        np.savez(path, kernel=np.zeros((2, 2)))
        with pytest.raises(ValueError, match="arr_0"):
            convert.load_keras_npz(path)

    def test_params_npz_round_trip(self, tmp_path):
        tree = pu.flax_discriminator_params(4)
        path = str(tmp_path / "params.npz")
        convert.save_params_npz(path, tree)
        _tree_equal(convert.load_params_npz(path), tree)


class TestEndToEnd:
    def test_converted_generator_matches_golden_forward(self):
        """get_weights() sequence -> converter -> Flax forward == the
        TF-computed golden output (the full import path a reference user
        runs, ending in the same numbers their trained model produced)."""
        path = os.path.join(GOLDEN, "networks_rgba.npz")
        if not os.path.exists(path):
            pytest.skip("networks_rgba.npz missing; run make_golden_networks")
        import jax
        import jax.numpy as jnp

        from palette_and_histo_gan_tpu.models.networks import UnetGenerator

        g = np.load(path)
        spec = convert.generator_weight_spec(4, 4)
        tree = convert.keras_generator_weights_to_flax(
            _ordered_arrays(spec), 4, 4
        )
        gen = UnetGenerator(
            input_channels=4,
            output_channels=4,
            last_activation="tanh",
            transpose_impl="lax",
        )
        fake = gen.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, tree)},
            jnp.asarray(g["source"]),
            deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(fake), g["fake"], atol=1e-4)
