import os

import numpy as np
import pytest

from tdgs.datasets._native import NativePrefetcher, decode_image, get_lib


def _write_images(tmp_path, n=6):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
        ext = ".png" if i % 2 == 0 else ".jpg"
        p = str(tmp_path / f"img_{i}{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append((p, arr))
    return paths


@pytest.mark.skipif(get_lib() is None, reason="native loader build failed")
def test_native_decode_matches_pil(tmp_path):
    from PIL import Image

    for p, want in _write_images(tmp_path):
        got = decode_image(p)
        assert got is not None
        assert got.shape == want.shape
        pil = np.asarray(Image.open(p).convert("RGB"))
        if p.endswith(".png"):
            np.testing.assert_array_equal(got, want)  # lossless
        # decoders must agree with PIL's own decode
        np.testing.assert_allclose(
            got.astype(int), pil.astype(int), atol=1
        )


@pytest.mark.skipif(get_lib() is None, reason="native loader build failed")
def test_native_downsample(tmp_path):
    from PIL import Image

    arr = np.zeros((32, 32, 3), np.uint8)
    arr[:16] = 100
    arr[16:] = 200
    p = str(tmp_path / "a.png")
    Image.fromarray(arr).save(p)
    small = decode_image(p, factor=2)
    assert small.shape == (16, 16, 3)
    assert (small[:8] == 100).all() and (small[8:] == 200).all()


@pytest.mark.skipif(get_lib() is None, reason="native loader build failed")
def test_prefetcher_roundtrip(tmp_path):
    pairs = _write_images(tmp_path)
    pf = NativePrefetcher([p for p, _ in pairs], n_threads=3)
    # request out of order, then fetch all
    for i in reversed(range(len(pairs))):
        pf.request(i)
    for i, (p, want) in enumerate(pairs):
        got = pf.get(i)
        assert got is not None and got.shape == want.shape
        if p.endswith(".png"):
            np.testing.assert_array_equal(got, want)
    pf.close()


@pytest.mark.skipif(get_lib() is None, reason="native loader build failed")
def test_decode_missing_file():
    assert decode_image("/nonexistent/x.png") is None
