"""Pipeline-prep tool CLIs (reference utils/instance_maps_to_npy.py,
utils/crop_data.py — the mask/dataset preparation stage of the rally
workflow, SURVEY.md §2.4)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8)).save(path)


def test_create_instance_id_map_table_and_discovery():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from instance_maps_to_npy import create_instance_id_map

    mask = np.zeros((10, 12, 3), np.uint8)
    mask[2:5, 2:5] = [255, 0, 0]      # table id 1
    mask[6:9, 6:9] = [0, 0, 255]      # table id 3
    mask[0:2, 8:12] = [255, 255, 0]   # unknown color → fresh id
    ids = create_instance_id_map(mask)
    assert ids.shape == (10, 12)
    assert ids[3, 3] == 1 and ids[7, 7] == 3 and ids[0, 0] == 0
    assert ids[1, 9] >= 4  # auto-discovered


def test_instance_maps_cli(tmp_path):
    masks = tmp_path / "masks"
    os.makedirs(masks)
    m = np.zeros((8, 8, 3), np.uint8)
    m[2:6, 2:6] = [0, 255, 0]
    _write_png(str(masks / "frame0.png"), m)
    out = tmp_path / "ids"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "instance_maps_to_npy.py"),
         "--masks-dir", str(masks), "--out-dir", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    ids = np.load(str(out / "frame0_instance_id.npy"))
    assert ids[4, 4] == 2 and ids[0, 0] == 0


def test_crop_data_cli(tmp_path):
    imgs, masks = tmp_path / "images", tmp_path / "masks"
    os.makedirs(imgs)
    os.makedirs(masks)
    for i in range(2):
        img = np.full((32, 40, 3), 30, np.uint8)
        img[8:20, 10:30] = 200
        mask = np.zeros((32, 40, 3), np.uint8)
        mask[8 + i:20, 10:30 - i] = 255
        _write_png(str(imgs / f"im{i}.png"), img)
        _write_png(str(masks / f"im{i}.png"), mask)
    out = tmp_path / "cropped"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "crop_data.py"),
         "--images", str(imgs), "--masks", str(masks), "--out", str(out),
         "--margin", "2"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    from PIL import Image

    c0 = np.asarray(Image.open(str(out / "images" / "im0.png")))
    c1 = np.asarray(Image.open(str(out / "images" / "im1.png")))
    # cropped to the union content bbox + margin, identical across images
    assert c0.shape == c1.shape
    assert c0.shape[0] < 32 and c0.shape[1] < 40
    assert c0.max() == 200
