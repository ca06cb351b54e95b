"""COLMAP scene parser + dataset (host-side numpy).

Capability parity with the reference's examples/datasets/colmap.py
(Parser:56, Dataset:394), without the pycolmap/cv2/torch dependencies:

- sparse model loading via tdgs.datasets.colmap_io
- factor-downsampled image dirs (``images_{factor}``) with graceful fallback
- per-camera undistortion maps computed in numpy (cv2.initUndistortRectifyMap
  equivalent: forward-distort the ideal grid, bilinear-remap)
- world normalization (similarity from cameras + PCA alignment)
- scene_scale from camera spread
- fork extensions: instance-id masks (masks/instance_ids_npy/
  *_instance_id.npy), precomputed dense depths (refined_depths/
  *_refined_depth.npy), sparse COLMAP point depths per image
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np

from tdgs.datasets import normalize as nrm
from tdgs.datasets.colmap_io import load_colmap_model, qvec_to_rotmat


def _imread(path: str) -> np.ndarray:
    # native C++ decoder (libjpeg/libpng, tdgs/datasets/_native.py) with a
    # PIL fallback when the toolchain is unavailable
    from tdgs.datasets._native import decode_image

    arr = decode_image(path)
    if arr is not None:
        return arr
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def _nearest_resize(arr: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbor resize of a [H, W(, C)] map to (height, width) —
    used to match auxiliary maps (refined depths, normal maps) to the
    possibly-downsampled image resolution."""
    if arr.shape[:2] == (height, width):
        return arr
    yi = (np.arange(height) * arr.shape[0] / height).astype(np.int64)
    xi = (np.arange(width) * arr.shape[1] / width).astype(np.int64)
    return arr[yi][:, xi]


def _bilinear_remap(img: np.ndarray, map_x: np.ndarray, map_y: np.ndarray) -> np.ndarray:
    """Sample img at float coords (map_x, map_y) with bilinear interpolation."""
    H, W = img.shape[:2]
    x0 = np.clip(np.floor(map_x).astype(np.int32), 0, W - 1)
    y0 = np.clip(np.floor(map_y).astype(np.int32), 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    wx = np.clip(map_x - x0, 0, 1)[..., None]
    wy = np.clip(map_y - y0, 0, 1)[..., None]
    img = img.astype(np.float32)
    top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
    bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
    return top * (1 - wy) + bot * wy


def _distort_perspective(x, y, d):
    """OpenCV perspective distortion forward model (k1,k2,p1,p2,k3)."""
    k1, k2, p1, p2, k3, _ = d
    r2 = x * x + y * y
    radial = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return xd, yd


def _distort_fisheye(x, y, d):
    """OpenCV fisheye (equidistant) distortion forward model (k1..k4)."""
    k1, k2, _, _, k3, k4 = d
    r = np.sqrt(x * x + y * y)
    theta = np.arctan(r)
    theta_d = theta * (
        1 + theta**2 * (k1 + theta**2 * (k2 + theta**2 * (k3 + theta**2 * k4)))
    )
    scale = np.where(r > 1e-8, theta_d / np.maximum(r, 1e-8), 1.0)
    return x * scale, y * scale


def build_undistort_map(K, dist, dist_type, width, height):
    """For each output (undistorted) pixel, the source pixel to sample.
    Equivalent to cv2.initUndistortRectifyMap with new K = K."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u, v = np.meshgrid(np.arange(width), np.arange(height))
    x = (u - cx) / fx
    y = (v - cy) / fy
    if dist_type == "fisheye":
        xd, yd = _distort_fisheye(x, y, dist)
    else:
        xd, yd = _distort_perspective(x, y, dist)
    return (xd * fx + cx).astype(np.float32), (yd * fy + cy).astype(np.float32)


class Parser:
    """COLMAP scene parser (reference examples/datasets/colmap.py:Parser)."""

    def __init__(
        self,
        data_dir: str,
        factor: int = 1,
        normalize: bool = True,
        test_every: int = 8,
        load_instance_masks: bool = False,
        load_normals: bool = False,
    ):
        self.data_dir = data_dir
        self.factor = factor
        self.normalize = normalize
        self.test_every = test_every
        self.load_instance_masks = load_instance_masks
        self.load_normals = load_normals

        sparse = os.path.join(data_dir, "sparse", "0")
        if not os.path.isdir(sparse):
            sparse = os.path.join(data_dir, "sparse")
        model = load_colmap_model(sparse)

        # sorted by image name for deterministic splits (as the reference)
        images = sorted(model.images.values(), key=lambda im: im.name)
        self.image_names: List[str] = [im.name for im in images]

        w2c = np.stack(
            [
                np.vstack(
                    [
                        np.hstack([qvec_to_rotmat(im.qvec), im.tvec[:, None]]),
                        [0, 0, 0, 1],
                    ]
                )
                for im in images
            ]
        )
        camtoworlds = np.linalg.inv(w2c)

        # per-image intrinsics (downscaled by factor)
        self.Ks_dict: Dict[int, np.ndarray] = {}
        self.params_dict: Dict[int, Any] = {}
        self.imsize_dict: Dict[int, tuple] = {}
        self.camera_ids = [im.camera_id for im in images]
        self.mask_dict: Dict[int, Optional[np.ndarray]] = {}
        for cam_id, cam in model.cameras.items():
            K = cam.K().copy()
            K[:2] /= factor
            self.Ks_dict[cam_id] = K
            dist, dist_type = cam.distortion()
            self.params_dict[cam_id] = (dist, dist_type)
            self.imsize_dict[cam_id] = (
                int(round(cam.width / factor)),
                int(round(cam.height / factor)),
            )
            self.mask_dict[cam_id] = None

        # image dir: images_{factor} convention, fallback to images/
        img_dir = os.path.join(data_dir, f"images_{factor}" if factor > 1 else "images")
        if not os.path.isdir(img_dir):
            img_dir = os.path.join(data_dir, "images")
        self.image_dir = img_dir
        self.image_paths = [os.path.join(img_dir, name) for name in self.image_names]

        points = model.points.astype(np.float32)
        self.points_err = model.point_errors.astype(np.float32)
        self.points_rgb = model.point_colors

        # map point3D id -> row for per-image depth lookups
        self._pid_to_row = {int(pid): i for i, pid in enumerate(model.point_ids)}
        self.point_indices: Dict[str, np.ndarray] = {}
        for im in images:
            valid = im.point3D_ids >= 0
            rows = np.array(
                [self._pid_to_row.get(int(p), -1) for p in im.point3D_ids[valid]],
                dtype=np.int64,
            )
            self.point_indices[im.name] = rows[rows >= 0]

        if normalize:
            T1 = nrm.similarity_from_cameras(camtoworlds)
            camtoworlds = nrm.transform_cameras(T1, camtoworlds)
            points = nrm.transform_points(T1, points)
            T2 = nrm.align_principal_axes(points)
            camtoworlds = nrm.transform_cameras(T2, camtoworlds)
            points = nrm.transform_points(T2, points)
            self.transform = T2 @ T1
        else:
            self.transform = np.eye(4)

        self.camtoworlds = camtoworlds.astype(np.float32)
        self.points = points.astype(np.float32)

        # scene scale from camera spread (reference colmap.py:387-391)
        camera_locs = camtoworlds[:, :3, 3]
        scene_center = camera_locs.mean(0)
        dists = np.linalg.norm(camera_locs - scene_center, axis=-1)
        self.scene_scale = float(dists.max()) * 1.1

    def undistort(self, cam_id: int, image: np.ndarray) -> np.ndarray:
        dist, dist_type = self.params_dict[cam_id]
        if not np.any(dist):
            return image
        H, W = image.shape[:2]
        mx, my = build_undistort_map(self.Ks_dict[cam_id], dist, dist_type, W, H)
        if self.mask_dict.get(cam_id) is None:
            # valid-pixel ROI: output pixels whose source sample lies inside
            # the original frame (reference colmap.py:364-385 builds the
            # same mask from the fisheye remap and attaches it per item)
            self.mask_dict[cam_id] = (
                (mx >= 0) & (mx <= W - 1) & (my >= 0) & (my <= H - 1)
            )
        return _bilinear_remap(image, mx, my)


class Dataset:
    """Indexable dataset over a Parser split (reference Dataset:394)."""

    def __init__(
        self,
        parser: Parser,
        split: str = "train",
        patch_size: Optional[int] = None,
        load_depths: bool = False,
    ):
        self.parser = parser
        self.split = split
        self.patch_size = patch_size
        self.load_depths = load_depths
        self._prefetcher = None
        n = len(parser.image_names)
        idx = np.arange(n)
        if split == "train":
            self.indices = idx[idx % parser.test_every != 0]
        else:
            self.indices = idx[idx % parser.test_every == 0]

    def __len__(self):
        return len(self.indices)

    def enable_prefetch(self, n_threads: int = 4) -> bool:
        """Start the native decode-ahead prefetcher (the TPU-native
        counterpart of torch DataLoader workers, reference
        simple_trainer.py DataLoader(num_workers=4)). Returns False when
        the native loader is unavailable (PIL fallback stays in place)."""
        from tdgs.datasets._native import NativePrefetcher, get_lib

        if get_lib() is None:
            return False
        self._prefetcher = NativePrefetcher(
            list(self.parser.image_paths), factor=1, n_threads=n_threads
        )
        return True

    def prefetch(self, items) -> None:
        """Queue decode-ahead for upcoming DATASET indices (non-blocking)."""
        if self._prefetcher is None:
            return
        for it in np.asarray(items).reshape(-1):
            self._prefetcher.request(int(self.indices[int(it)]))

    def __getitem__(self, item: int) -> Dict[str, Any]:
        p = self.parser
        index = int(self.indices[item])
        cam_id = p.camera_ids[index]
        image = None
        if self._prefetcher is not None:
            image = self._prefetcher.get(index)  # blocks only if not ready
        if image is None:
            image = _imread(p.image_paths[index])
        image = image.astype(np.float32) / 255.0
        image = p.undistort(cam_id, image)
        K = p.Ks_dict[cam_id].astype(np.float32)
        camtoworld = p.camtoworlds[index]

        data = {
            "K": K,
            "camtoworld": camtoworld,
            "viewmat": np.linalg.inv(camtoworld).astype(np.float32),
            "image": image,
            "image_id": index,
            "image_name": p.image_names[index],
        }
        if p.mask_dict.get(cam_id) is not None:
            # undistortion ROI: rendered pixels outside it are zeroed in
            # the loss (reference rasterize_splats:625-626)
            data["mask"] = p.mask_dict[cam_id]
        if p.load_normals:
            # monocular normal maps: normals/{stem}.npy ([-1,1] float
            # [H,W,3]) or normals/{image name} as an RGB encoding
            # (reference Parser load_normals, colmap.py:206-242)
            stem = os.path.splitext(p.image_names[index])[0]
            npy = os.path.join(p.data_dir, "normals", f"{stem}.npy")
            png = os.path.join(p.data_dir, "normals", p.image_names[index])
            nmap = None
            if os.path.exists(npy):
                nmap = np.load(npy).astype(np.float32)
            elif os.path.exists(png):
                nmap = _imread(png).astype(np.float32) / 255.0 * 2.0 - 1.0
            if nmap is not None:
                H, W = data["image"].shape[:2]
                data["normal"] = _nearest_resize(nmap, H, W)

        if self.load_depths:
            # sparse COLMAP point depths (reference colmap.py:552-574)
            rows = p.point_indices.get(p.image_names[index], np.empty(0, np.int64))
            pts = p.points[rows]
            w2c = data["viewmat"]
            cam_pts = pts @ w2c[:3, :3].T + w2c[:3, 3]
            depths = cam_pts[:, 2]
            uv = cam_pts @ K.T
            uv = uv[:, :2] / np.maximum(uv[:, 2:3], 1e-8)
            H, W = image.shape[:2]
            sel = (
                (depths > 0)
                & (uv[:, 0] >= 0) & (uv[:, 0] < W)
                & (uv[:, 1] >= 0) & (uv[:, 1] < H)
            )
            data["points"] = uv[sel].astype(np.float32)
            data["depths"] = depths[sel].astype(np.float32)

        if p.load_instance_masks or self.load_depths:
            stem = os.path.splitext(p.image_names[index])[0]
            if p.load_instance_masks:
                mpath = os.path.join(
                    p.data_dir, "masks", "instance_ids_npy",
                    f"{stem}_instance_id.npy"
                )
                if os.path.exists(mpath):
                    data["instance_mask"] = np.load(mpath)
            dpath = os.path.join(
                p.data_dir, "refined_depths", f"{stem}_refined_depth.npy"
            )
            if os.path.exists(dpath):
                # resized to the image resolution — the reference
                # interpolates depth_map to render scale
                # (simple_trainer.py:731-737)
                H, W = data["image"].shape[:2]
                data["refined_depth"] = _nearest_resize(
                    np.load(dpath).astype(np.float32), H, W
                )

        if self.patch_size is not None:
            H, W = data["image"].shape[:2]
            ps = self.patch_size
            x = np.random.randint(0, max(W - ps, 1))
            y = np.random.randint(0, max(H - ps, 1))
            data["image"] = data["image"][y : y + ps, x : x + ps]
            K = K.copy()
            K[0, 2] -= x
            K[1, 2] -= y
            data["K"] = K
            if "instance_mask" in data:
                data["instance_mask"] = data["instance_mask"][y : y + ps, x : x + ps]
            if "refined_depth" in data:
                data["refined_depth"] = data["refined_depth"][y : y + ps, x : x + ps]
            if "mask" in data:
                data["mask"] = data["mask"][y : y + ps, x : x + ps]

        return data
