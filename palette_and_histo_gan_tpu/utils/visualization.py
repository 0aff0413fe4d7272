"""Preview grids and discriminator patch-map rendering.

Mirrors the reference's matplotlib visualizations:
  - preview_generated_images_during_training (pix2pix_model.py:127-159):
    rows of [Input, Target, Generated] images
  - debug_discriminator_patches (pix2pix_model.py:161-229): sigmoid patch
    maps upscaled to image resolution by repeat + pad

Figures are written to PNG files and returned as HWC uint8 arrays for the
TensorBoard image log (replacing io_utils.plot_to_image:106-120).
"""

from __future__ import annotations

import os

import numpy as np


def _to_display(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> [0, 1] for imshow (reference: img * 0.5 + 0.5)."""
    return np.clip(np.asarray(img) * 0.5 + 0.5, 0.0, 1.0)


# One cached figure per grid layout: building 18 axes + tight_layout and
# rendering the figure twice (savefig + canvas.draw) made each preview cost
# ~1.3 s — 25% of an end-to-end training run (41 previews/run). Reusing the
# axes and rendering once (the PNG is written from the same drawn buffer)
# keeps the identical layout/titles at a fraction of the cost.
_GRID_CACHE: dict = {}


def _grid_figure(num_images: int, num_columns: int, img_shape: tuple):
    key = (num_images, num_columns, img_shape)
    cached = _GRID_CACHE.get(key)
    if cached is not None:
        return cached
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    figure = plt.figure(figsize=(4 * num_columns, 4 * num_images))
    axes_images = []
    titles = []
    placeholder = np.zeros(img_shape, dtype=np.float32)
    for i in range(num_images):
        row = []
        for j in range(num_columns):
            ax = figure.add_subplot(num_images, num_columns, i * num_columns + j + 1)
            # representative text (not empty) so tight_layout below reserves
            # the top-row title space; real titles are set_text per call
            text = ax.set_title(
                "Generated (0.0k)" if i == 0 else "",
                fontdict={"fontsize": 24},
            )
            if i == 0:
                titles.append(text)
            row.append(ax.imshow(placeholder))
            ax.axis("off")
        axes_images.append(row)
    figure.tight_layout()
    _GRID_CACHE[key] = (figure, axes_images, titles)
    return _GRID_CACHE[key]


def _show_unit(img: np.ndarray) -> np.ndarray:
    """Display scaling for values_in_unit_range callers.

    Integer-dtype images (palette decodes: int32/uint8 palette entries) are
    on the 0-255 scale regardless of how dark they are; float images are
    already unit-range. A dtype check — not a magnitude heuristic — so a
    legitimately near-black decoded sprite (all values <= 1) still divides
    by 255 instead of rendering value-1 pixels at full brightness."""
    img = np.asarray(img)
    if np.issubdtype(img.dtype, np.integer):
        img = img / 255.0
    return np.clip(img, 0.0, 1.0)


def _write_png(data: np.ndarray, save_name: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(save_name), exist_ok=True)
    Image.fromarray(data).save(save_name)


def preview_grid(
    sources: np.ndarray,
    targets: np.ndarray,
    generated: np.ndarray,
    save_name: str | None = None,
    step: int | None = None,
    values_in_unit_range: bool = False,
) -> np.ndarray:
    """Rows of [Input, Target, Generated]; returns the figure as HWC uint8.

    values_in_unit_range=True for indexed-variant images already in [0, 1]
    or [0, 255] uint8 decoded via palette.
    """
    title = ["Input", "Target", "Generated"]
    if step is not None:
        title[-1] += f" ({step / 1000}k)"
    num_images = len(sources)
    num_columns = len(title)

    img0 = np.asarray(sources[0])
    figure, axes_images, titles = _grid_figure(
        num_images, num_columns, tuple(img0.shape)
    )
    for j in range(num_columns):
        titles[j].set_text(title[j])
    for i in range(num_images):
        images = [sources[i], targets[i], generated[i]]
        for j in range(num_columns):
            img = np.asarray(images[j])
            if values_in_unit_range:
                img = _show_unit(img)
            else:
                img = _to_display(img)
            axes_images[i][j].set_data(img)
    figure.canvas.draw()
    data = np.asarray(figure.canvas.buffer_rgba())[..., :3].copy()

    if save_name is not None:
        _write_png(data, save_name)
    return data


def upscale_patches(patches: np.ndarray, img_size: int = 64) -> np.ndarray:
    """(P, P, 1) sigmoid patch map -> (img_size, img_size) by repeat + pad
    (pix2pix_model.py:178-191)."""
    patches = np.asarray(patches)
    num_patches = patches.shape[0]
    factor = img_size // num_patches
    pad_before = (img_size - num_patches * factor) // 2
    pad_after = (img_size - num_patches * factor) - pad_before
    up = np.repeat(np.repeat(patches, factor, axis=0), factor, axis=1)
    up = np.pad(up, [[pad_before, pad_after], [pad_before, pad_after], [0, 0]])
    return up[:, :, 0]


def discriminator_debug_figure(
    source: np.ndarray,
    target: np.ndarray,
    generated: np.ndarray,
    real_patches: np.ndarray,
    fake_patches: np.ndarray,
    save_name: str | None = None,
    values_in_unit_range: bool = False,
) -> np.ndarray:
    """[Source, Target, D(target), Generated, D(generated)] strip
    (pix2pix_model.py:198-229)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    img_size = source.shape[0]
    real_up = upscale_patches(real_patches, img_size)
    fake_up = upscale_patches(fake_patches, img_size)
    real_mean = float(np.mean(real_patches))
    fake_mean = float(np.mean(fake_patches))

    def show(img):
        if values_in_unit_range:
            return _show_unit(img)
        return _to_display(img)

    panels = [
        ("Source", show(source), None),
        ("Target", show(target), None),
        (f"Discriminated target {real_mean:.3f}", real_up, "gray"),
        ("Generated", show(generated), None),
        (f"Discriminated generated {fake_mean:.3f}", fake_up, "gray"),
    ]
    figure = plt.figure(figsize=(6 * len(panels), 6))
    for i, (title, img, cmap) in enumerate(panels):
        plt.subplot(1, len(panels), i + 1)
        plt.title(title, fontdict={"fontsize": 20})
        if cmap:
            plt.imshow(img, cmap=cmap, vmin=0.0, vmax=1.0)
        else:
            plt.imshow(img)
        plt.axis("off")

    figure.canvas.draw()
    data = np.asarray(figure.canvas.buffer_rgba())[..., :3].copy()
    plt.close(figure)
    if save_name is not None:
        _write_png(data, save_name)
    return data
