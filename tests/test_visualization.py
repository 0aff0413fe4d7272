"""Preview/debug figure helpers (pix2pix_model.py:127-229 semantics)."""

import numpy as np

from palette_and_histo_gan_tpu.utils import visualization as viz


def test_show_unit_scales_by_dtype_not_magnitude():
    # A legitimately near-black palette decode (int values all <= 1) must
    # still be treated as 0-255-coded: value 1 renders at 1/255, not at
    # full brightness (the old max()>1.5 heuristic got this wrong).
    dark_int = np.zeros((4, 4, 4), np.int32)
    dark_int[0, 0] = 1
    out = viz._show_unit(dark_int)
    assert out.dtype.kind == "f"
    np.testing.assert_allclose(out[0, 0], 1.0 / 255.0)
    # uint8 palette decodes are also 0-255-coded
    bright = np.full((2, 2, 4), 255, np.uint8)
    np.testing.assert_allclose(viz._show_unit(bright), 1.0)
    # float images are already unit-range and pass through (clipped)
    unit = np.asarray([[0.25, 1.5]], np.float32)
    np.testing.assert_allclose(viz._show_unit(unit), [[0.25, 1.0]])


def test_upscale_patches_repeat_and_pad():
    # (P, P, 1) -> (img, img) by factor repeat + symmetric pad
    # (pix2pix_model.py:178-191)
    patches = np.arange(9, dtype=np.float32).reshape(3, 3, 1)
    up = viz.upscale_patches(patches, img_size=8)
    assert up.shape == (8, 8)
    # factor = 8 // 3 = 2, pad = (8 - 6) split 1/1
    assert up[0, 0] == 0.0  # padding
    assert up[1, 1] == patches[0, 0, 0]
    assert up[2, 2] == patches[0, 0, 0] or up[2, 2] == patches[1, 1, 0]


def test_preview_grid_renders_dark_indexed_decode_dark(monkeypatch):
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (2, 8, 8, 4)).astype(np.int32)
    tgt = rng.integers(0, 256, (2, 8, 8, 4)).astype(np.int32)
    dark = np.zeros((2, 8, 8, 4), np.int32)
    dark[..., 3] = 1  # alpha 1 on the 0-255 scale: still nearly transparent

    # Spy on the values_in_unit_range path: every cell must route through
    # _show_unit with dtype-based (not magnitude-heuristic) scaling, so the
    # alpha-1 decode stays at 1/255 — the old max()>1.5 heuristic rendered
    # it fully opaque.
    shown = []
    orig = viz._show_unit

    def spy(img):
        out = orig(img)
        shown.append(np.asarray(out))
        return out

    monkeypatch.setattr(viz, "_show_unit", spy)
    grid = viz.preview_grid(src, tgt, dark, values_in_unit_range=True)
    assert grid.dtype == np.uint8 and grid.ndim == 3 and grid.shape[2] == 3
    assert len(shown) == 6  # 2 rows x [Input, Target, Generated]
    for row in range(2):
        gen_cell = shown[3 * row + 2]
        np.testing.assert_allclose(gen_cell.max(), 1.0 / 255.0)
