"""Visualization helpers: colormaps, image savers, disparity dumps.

Reference: examples/utils.py — colormap:163, apply_float_colormap:179,
apply_depth_colormap:203, save_image_numpy:230, save_disparity_image:1485.
All numpy-in / numpy-out (host-side rendering utilities; nothing here runs
on device, so there is no reason to express it in jnp).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def set_random_seed(seed: int):
    """Seed host-side RNGs and return a jax PRNGKey for device-side
    sampling (reference utils.py:156-161 seeds random/np/torch; jax keys
    are explicit, so the key is returned rather than hidden state)."""
    import random

    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def apply_float_colormap(img: np.ndarray, colormap: str = "turbo") -> np.ndarray:
    """[..., 1] float in [0, 1] → [..., 3] colored float in [0, 1]
    (reference utils.py:179-200)."""
    from matplotlib import colormaps

    img = np.nan_to_num(np.asarray(img), nan=0.0)
    if colormap == "gray":
        return np.repeat(img, 3, axis=-1)
    img_long = (img * 255).astype(np.int64)
    assert img_long.min() >= 0, f"the min value is {img_long.min()}"
    assert img_long.max() <= 255, f"the max value is {img_long.max()}"
    table = np.asarray(colormaps[colormap].colors, np.float32)
    return table[img_long[..., 0]]


def apply_depth_colormap(
    depth: np.ndarray,
    acc: Optional[np.ndarray] = None,
    near_plane: Optional[float] = None,
    far_plane: Optional[float] = None,
) -> np.ndarray:
    """[..., 1] depth → [..., 3] turbo-colored image; optional accumulation
    mask blends toward white (reference utils.py:203-228)."""
    depth = np.asarray(depth, np.float32)
    near_plane = near_plane if near_plane is not None else float(depth.min())
    far_plane = far_plane if far_plane is not None else float(depth.max())
    depth = (depth - near_plane) / (far_plane - near_plane + 1e-10)
    depth = np.clip(depth, 0.0, 1.0)
    img = apply_float_colormap(depth, colormap="turbo")
    if acc is not None:
        acc = np.asarray(acc, np.float32)
        img = img * acc + (1.0 - acc)
    return img


def colormap(img: np.ndarray, cmap: str = "jet") -> np.ndarray:
    """Render a 2D array through a matplotlib colormap with a colorbar,
    returning an RGB uint8 canvas (reference utils.py:163-177; returns
    HWC uint8 instead of a CHW torch tensor)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    W, H = img.shape[:2]
    dpi = 300
    fig, ax = plt.subplots(1, figsize=(H / dpi, W / dpi), dpi=dpi)
    im = ax.imshow(img, cmap=cmap)
    ax.set_axis_off()
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return data


def save_image(image: np.ndarray, filename: str) -> None:
    """Save [H, W, 3] / [1, H, W, 3] / [1, 3, H, W] float [0,1] as a PNG
    (reference save_image_numpy/save_image_tensor:230-282, which take the
    CHW torch layout; HWC is accepted too)."""
    from PIL import Image

    image = np.asarray(image)
    if image.ndim == 4:
        image = image[0]
    if image.ndim == 3 and image.shape[0] in (1, 3) and image.shape[-1] not in (1, 3):
        image = np.transpose(image, (1, 2, 0))
    if image.shape[-1] == 1:
        image = np.repeat(image, 3, axis=-1)
    d = os.path.dirname(filename)
    if d:
        os.makedirs(d, exist_ok=True)
    Image.fromarray(
        (np.clip(image, 0.0, 1.0) * 255).astype(np.uint8)
    ).save(filename)


# reference-name aliases (utils.py:230/:255 expose the same op under two
# names for numpy vs torch inputs; both are numpy here)
save_image_numpy = save_image
save_image_tensor = save_image


def save_disparity_image(
    disp: np.ndarray,
    output_path: str,
    points: Optional[np.ndarray] = None,
    height: Optional[int] = None,
    width: Optional[int] = None,
    cmap: Optional[str] = "viridis",
) -> None:
    """Save a dense [H, W] or sparse [M] disparity visualization
    (reference utils.py:1485-1575). Sparse values are splatted onto a
    black canvas at integer ``points`` [M, 2] (x, y)."""
    disp = np.asarray(disp, np.float32).squeeze()
    if disp.ndim == 1:
        assert points is not None and height and width, (
            "sparse disparity needs points + height + width"
        )
        canvas = np.zeros((height, width), np.float32)
        pts = np.asarray(points).reshape(-1, 2).astype(np.int64)
        xs = np.clip(pts[:, 0], 0, width - 1)
        ys = np.clip(pts[:, 1], 0, height - 1)
        canvas[ys, xs] = disp
        disp = canvas
    lo, hi = float(disp.min()), float(disp.max())
    norm = (disp - lo) / (hi - lo + 1e-10)
    if cmap is None:
        img = np.repeat(norm[..., None], 3, axis=-1)
    else:
        img = apply_float_colormap(norm[..., None], colormap=cmap)
    save_image(img, output_path)
