"""Visualization utils (reference examples/utils.py:163-282, 1485)."""

import numpy as np

from tdgs.utils.viz import (
    apply_depth_colormap,
    apply_float_colormap,
    colormap,
    save_disparity_image,
    save_image,
    set_random_seed,
)


def test_apply_float_colormap_shapes_and_range():
    img = np.linspace(0, 1, 24, dtype=np.float32).reshape(4, 6, 1)
    out = apply_float_colormap(img)
    assert out.shape == (4, 6, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    gray = apply_float_colormap(img, colormap="gray")
    assert gray.shape == (4, 6, 3)
    np.testing.assert_array_equal(gray[..., 0], img[..., 0])


def test_apply_depth_colormap_with_acc():
    depth = np.random.default_rng(0).uniform(1, 5, (8, 8, 1)).astype(np.float32)
    acc = np.ones((8, 8, 1), np.float32) * 0.5
    out = apply_depth_colormap(depth, acc=acc, near_plane=1.0, far_plane=5.0)
    assert out.shape == (8, 8, 3)
    assert np.isfinite(out).all()
    # zero accumulation → white background
    white = apply_depth_colormap(depth, acc=np.zeros_like(acc))
    np.testing.assert_allclose(white, 1.0)


def test_colormap_canvas():
    img = np.random.default_rng(1).uniform(size=(16, 16)).astype(np.float32)
    out = colormap(img, cmap="jet")
    assert out.ndim == 3 and out.shape[-1] == 3 and out.dtype == np.uint8


def test_save_image_layouts(tmp_path):
    hwc = np.random.default_rng(2).uniform(size=(8, 10, 3)).astype(np.float32)
    save_image(hwc, str(tmp_path / "a.png"))
    save_image(hwc[None], str(tmp_path / "b.png"))          # [1, H, W, 3]
    chw = np.transpose(hwc, (2, 0, 1))[None]                 # [1, 3, H, W]
    save_image(chw, str(tmp_path / "c.png"))
    from PIL import Image

    for f in ("a.png", "b.png", "c.png"):
        assert Image.open(str(tmp_path / f)).size == (10, 8)
    a = np.asarray(Image.open(str(tmp_path / "a.png")))
    c = np.asarray(Image.open(str(tmp_path / "c.png")))
    np.testing.assert_array_equal(a, c)


def test_save_disparity_dense_and_sparse(tmp_path):
    dense = np.random.default_rng(3).uniform(size=(6, 9)).astype(np.float32)
    save_disparity_image(dense, str(tmp_path / "d.png"))
    pts = np.array([[1, 2], [5, 4], [8, 0]], np.float32)
    vals = np.array([0.1, 0.5, 1.0], np.float32)
    save_disparity_image(vals, str(tmp_path / "s.png"),
                         points=pts, height=6, width=9)
    from PIL import Image

    assert Image.open(str(tmp_path / "d.png")).size == (9, 6)
    assert Image.open(str(tmp_path / "s.png")).size == (9, 6)


def test_set_random_seed_returns_key():
    key = set_random_seed(42)
    assert key is not None
    a = np.random.uniform()
    set_random_seed(42)
    assert np.random.uniform() == a
