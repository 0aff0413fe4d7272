"""Config construction-time validation (config.py::__post_init__).

Before this, a typo'd option (e.g. histogram_bwd="tri3") surfaced as a
bare KeyError or an opaque lowering failure at trace time, deep inside a
jitted step; now every enum-like field fails at Config construction with
the valid set in the message.
"""

import pytest

from palette_and_histo_gan_tpu.config import (
    MODEL_VARIANTS,
    Config,
    config_for_variant,
)


def test_all_variant_defaults_construct():
    for variant in MODEL_VARIANTS:
        config_for_variant(variant)


@pytest.mark.parametrize(
    "field,bad",
    [
        ("model", "pix2pix"),
        ("palette_ordering", "frequency"),
        ("histogram_method", "rbf"),  # the reference spells it "RBF"
        ("histogram_bwd", "tri3"),
        ("histogram_impl", "pallas9"),
        ("augment_impl", "mosaic"),
        ("transpose_impl", "subpixel2"),
        ("head_conv", "padded"),
        ("infer_head_conv", "auto"),
        ("compute_dtype", "fp16"),
        ("data_parallel", "maybe"),
        ("source_direction", 7),
        ("target_direction", -1),
    ],
)
def test_invalid_enum_raises_with_field_name(field, bad):
    with pytest.raises(ValueError, match=field):
        Config(**{field: bad})


def test_misaligned_data_roots_raise():
    with pytest.raises(ValueError, match="align 1:1"):
        Config(data_roots=("a", "b"), dataset_sizes=(294,))
    # aligned multi-root is fine
    Config(data_roots=("a", "b"), dataset_sizes=(294, 100))
    # a dataset_sizes override misaligned with the single DEFAULT root must
    # also fail at construction, not later in the loader
    with pytest.raises(ValueError, match="align 1:1"):
        Config(dataset_sizes=(100, 200))
    with pytest.raises(ValueError, match=">= 1"):
        Config(dataset_sizes=(0,))


def test_bad_schedule_and_depths_raise():
    with pytest.raises(ValueError, match="batch_size"):
        Config(batch_size=0)
    with pytest.raises(ValueError, match="depth"):
        Config(down_filters=(8,) * 6, up_filters=(8,) * 5)


def test_replace_revalidates():
    config = config_for_variant("histogram")
    with pytest.raises(ValueError, match="histogram_bwd"):
        config.replace(histogram_bwd="nope")
