import os
import struct

import numpy as np
import pytest

from tdgs.datasets import Parser, Dataset
from tdgs.datasets import normalize as nrm
from tdgs.datasets import traj
from tdgs.datasets.colmap_io import load_colmap_model, qvec_to_rotmat


def write_synthetic_colmap(root, n_images=6, width=64, height=48, n_points=100):
    """Write a minimal COLMAP binary model + images for parser tests."""
    rng = np.random.default_rng(0)
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)

    # cameras.bin: one PINHOLE camera
    with open(os.path.join(sparse, "cameras.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", 1))
        fd.write(struct.pack("<iiQQ", 1, 1, width, height))
        fd.write(struct.pack("<4d", 60.0, 60.0, width / 2, height / 2))

    # points3D.bin
    pts = rng.normal(size=(n_points, 3)) * 0.5 + [0, 0, 4.0]
    with open(os.path.join(sparse, "points3D.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", n_points))
        for i in range(n_points):
            fd.write(struct.pack("<q", i + 1))
            fd.write(struct.pack("<3d", *pts[i]))
            fd.write(struct.pack("<3B", 100, 150, 200))
            fd.write(struct.pack("<d", 0.5))
            fd.write(struct.pack("<Q", 0))

    # images.bin: cameras on a circle looking at origin-ish
    from PIL import Image

    with open(os.path.join(sparse, "images.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            ang = 2 * np.pi * i / n_images
            # simple pose: identity rotation, shifted positions
            qvec = np.array([1.0, 0, 0, 0])
            tvec = np.array([np.cos(ang) * 0.5, np.sin(ang) * 0.5, 0.1 * i])
            name = f"img_{i:03d}.png"
            fd.write(struct.pack("<i", i + 1))
            fd.write(struct.pack("<4d", *qvec))
            fd.write(struct.pack("<3d", *tvec))
            fd.write(struct.pack("<i", 1))
            fd.write(name.encode() + b"\x00")
            # two 2D points, one tracked
            fd.write(struct.pack("<Q", 2))
            fd.write(struct.pack("<ddq", 10.0, 12.0, 1))
            fd.write(struct.pack("<ddq", 20.0, 22.0, -1))
            arr = (rng.uniform(0, 255, size=(height, width, 3))).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(imgdir, name))
    return pts


def test_colmap_io_roundtrip(tmp_path):
    pts = write_synthetic_colmap(str(tmp_path))
    model = load_colmap_model(str(tmp_path / "sparse" / "0"))
    assert len(model.cameras) == 1
    assert model.cameras[1].model == "PINHOLE"
    assert model.cameras[1].K()[0, 0] == 60.0
    assert len(model.images) == 6
    im = model.images[1]
    assert im.name == "img_000.png"
    assert im.xys.shape == (2, 2)
    assert im.point3D_ids[0] == 1 and im.point3D_ids[1] == -1
    np.testing.assert_allclose(model.points, np.sort_complex(model.points.view(complex)).view(float) if False else model.points)
    assert model.points.shape == (100, 3)


def test_parser_and_dataset(tmp_path):
    write_synthetic_colmap(str(tmp_path))
    parser = Parser(str(tmp_path), factor=1, normalize=True, test_every=3)
    assert parser.scene_scale > 0
    assert parser.points.shape[1] == 3

    train = Dataset(parser, "train", load_depths=True)
    val = Dataset(parser, "val")
    assert len(train) + len(val) == 6
    d = train[0]
    assert d["image"].shape == (48, 64, 3)
    assert d["image"].dtype == np.float32
    assert d["K"].shape == (3, 3)
    assert d["viewmat"].shape == (4, 4)
    # viewmat · camtoworld = I
    np.testing.assert_allclose(
        d["viewmat"] @ d["camtoworld"], np.eye(4), atol=1e-5
    )
    assert "depths" in d


def test_normalize_properties():
    rng = np.random.default_rng(1)
    n = 20
    c2w = np.tile(np.eye(4), (n, 1, 1))
    c2w[:, :3, 3] = rng.normal(size=(n, 3)) * 5 + 100.0
    for i in range(n):
        q = rng.normal(size=4)
        c2w[i, :3, :3] = qvec_to_rotmat(q)
    T = nrm.similarity_from_cameras(c2w)
    c2w2 = nrm.transform_cameras(T, c2w)
    # rotations stay orthonormal
    R = c2w2[:, :3, :3]
    np.testing.assert_allclose(
        R @ np.swapaxes(R, 1, 2), np.tile(np.eye(3), (n, 1, 1)), atol=1e-6
    )
    # recentered and rescaled: median distance ≈ 1
    d = np.linalg.norm(c2w2[:, :3, 3] - c2w2[:, :3, 3].mean(0), axis=-1)
    assert np.median(d) < 3.0

    pts = rng.normal(size=(500, 3)) * [10, 1, 0.1]
    T2 = nrm.align_principal_axes(pts)
    pts2 = nrm.transform_points(T2, pts)
    var = pts2.var(0)
    assert var[0] > var[1] > var[2]


def test_traj_paths():
    n = 8
    poses = np.tile(np.eye(4)[:3], (n, 1, 1))
    ang = np.linspace(0, np.pi, n)
    poses[:, 0, 3] = np.cos(ang) * 3
    poses[:, 1, 3] = np.sin(ang) * 3
    interp = traj.generate_interpolated_path(poses, n_interp=5)
    assert interp.shape == ((n - 1) * 5, 3, 4)
    # orthonormal rotations
    R = interp[:, :3, :3]
    np.testing.assert_allclose(
        R @ np.swapaxes(R, 1, 2), np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-5
    )
    ell = traj.generate_ellipse_path_z(poses, n_frames=12)
    assert ell.shape == (12, 3, 4)
    spiral = traj.generate_spiral_path(poses, n_frames=10)
    assert spiral.shape == (10, 3, 4)


def test_undistortion_identity_for_pinhole(tmp_path):
    write_synthetic_colmap(str(tmp_path))
    parser = Parser(str(tmp_path), factor=1, normalize=False)
    img = np.random.default_rng(2).uniform(size=(48, 64, 3)).astype(np.float32)
    out = parser.undistort(1, img)
    np.testing.assert_array_equal(out, img)  # PINHOLE: no distortion params


def test_dataset_prefetch_matches_sync(tmp_path):
    """Native decode-ahead must return byte-identical items to the
    synchronous path (trainer wiring: Dataset.enable_prefetch/prefetch)."""
    from tdgs.datasets._native import get_lib

    write_synthetic_colmap(str(tmp_path))
    parser = Parser(str(tmp_path), factor=1, normalize=True, test_every=3)
    ds_sync = Dataset(parser, "train")
    ds_pre = Dataset(parser, "train")
    if not ds_pre.enable_prefetch(n_threads=2):
        import pytest

        pytest.skip("native loader unavailable")
    ds_pre.prefetch(np.arange(len(ds_pre)))
    for i in range(len(ds_sync)):
        a = ds_sync[i]
        b = ds_pre[i]
        np.testing.assert_array_equal(a["image"], b["image"])
        assert a["image_id"] == b["image_id"]
    # second epoch (slots were consumed and reset)
    ds_pre.prefetch([0, 1])
    np.testing.assert_array_equal(ds_pre[0]["image"], ds_sync[0]["image"])


def test_undistortion_roi_mask(tmp_path):
    """Distorted cameras produce a valid-pixel ROI mask attached as
    data["mask"] (reference colmap.py:364-385 builds the same mask from
    the remap; delta: we keep the full frame + mask instead of cropping
    to the ROI bounding box)."""
    write_synthetic_colmap(str(tmp_path))
    from tdgs.datasets import Dataset, Parser

    parser = Parser(str(tmp_path), factor=1, normalize=False, test_every=100)
    # inject strong distortion (k1 > 0): the corner's source sample
    # r*(1 + k1*r^2) lands outside the original frame -> invalid
    parser.params_dict[1] = (
        np.array([0.4, 0.0, 0.0, 0.0, 0.0, 0.0]), "perspective",
    )
    ds = Dataset(parser, "train")
    item = ds[0]
    assert "mask" in item
    mask = item["mask"]
    assert mask.shape == item["image"].shape[:2]
    assert mask.dtype == np.bool_
    H, W = mask.shape
    assert mask[H // 2, W // 2]            # center valid
    assert not mask[0, 0], "corner should fall outside the source frame"
    assert mask.mean() > 0.5               # most of the frame survives
