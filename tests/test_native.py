"""Native C++ PNG decoder tests (skipped when the .so is not built)."""

import io
import os

import numpy as np
import pytest

from palette_and_histo_gan_tpu.config import Config
from palette_and_histo_gan_tpu.native import png_io

DATA_ROOT = Config().data_root
HAS_DATA = os.path.isdir(os.path.join(DATA_ROOT, "train", "2-front"))

pytestmark = pytest.mark.skipif(
    not png_io.available(), reason="native decoder not built (scripts/build_native.py)"
)


@pytest.mark.skipif(not HAS_DATA, reason="dataset not found")
def test_single_decode_matches_pil():
    from PIL import Image

    path = os.path.join(DATA_ROOT, "train", "0-back", "0.png")
    ours = png_io.decode_png_rgba(path)
    ref = np.asarray(Image.open(path).convert("RGBA"))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.skipif(not HAS_DATA, reason="dataset not found")
def test_batch_decode_matches_pil():
    from PIL import Image

    folder = os.path.join(DATA_ROOT, "test", "2-front")
    batch = png_io.decode_folder(folder, 10)
    assert batch.shape == (10, 64, 64, 4)
    for i in (0, 5, 9):
        ref = np.asarray(Image.open(os.path.join(folder, f"{i}.png")).convert("RGBA"))
        np.testing.assert_array_equal(batch[i], ref)


def test_synthetic_color_types(tmp_path):
    """Decode PIL-written PNGs of various color types."""
    from PIL import Image

    rng = np.random.default_rng(0)
    rgba = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)

    cases = {
        "rgba": Image.fromarray(rgba, "RGBA"),
        "rgb": Image.fromarray(rgba[..., :3], "RGB"),
        "gray": Image.fromarray(rgba[..., 0], "L"),
        "palette": Image.fromarray(rgba[..., :3], "RGB").quantize(64),
    }
    for name, img in cases.items():
        p = tmp_path / f"{name}.png"
        img.save(p)
        ours = png_io.decode_png_rgba(str(p))
        assert ours is not None, name
        ref = np.asarray(Image.open(p).convert("RGBA"))
        np.testing.assert_array_equal(ours, ref, err_msg=name)


def test_wrong_size_rejected(tmp_path):
    from PIL import Image

    img = Image.new("RGBA", (32, 32))
    p = tmp_path / "small.png"
    img.save(p)
    assert png_io.decode_png_rgba(str(p), h=64, w=64) is None


def test_missing_file():
    assert png_io.decode_png_rgba("/nonexistent/x.png") is None
