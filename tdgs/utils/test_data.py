"""Synthetic test-scene helper (parity with gsplat/_helper.py:load_test_data).

The reference loads a bundled garden-scene npz (absent in the fork) with a
``scene_grid`` replication knob to fake large scenes. Here the scene is
generated procedurally (no binary assets in the repo): a colorful blob
cloud plus a ground plane, with the same grid-replication trick.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def load_test_data(
    device=None,
    scene_grid: int = 1,
    n: int = 1000,
    seed: int = 42,
) -> Tuple:
    """Returns (means, quats, scales, opacities, colors, viewmats, Ks,
    width, height) as numpy arrays — one camera per grid cell."""
    rng = np.random.default_rng(seed)
    base_means = rng.normal(size=(n, 3)).astype(np.float32) * [1.2, 1.2, 0.4]
    base_means[:, 2] += 0.5
    colors = rng.uniform(0.1, 1.0, size=(n, 3)).astype(np.float32)

    means_list, colors_list = [], []
    viewmats, Ks = [], []
    width, height = 640, 480
    f = 500.0
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32)
    g = scene_grid
    for gy in range(g):
        for gx in range(g):
            offset = np.array([4.0 * gx, 4.0 * gy, 0.0], np.float32)
            means_list.append(base_means + offset)
            colors_list.append(colors)
            vm = np.eye(4, dtype=np.float32)
            vm[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
            cam = offset + np.array([0.0, -6.0, 1.5], np.float32)
            vm[:3, 3] = -(vm[:3, :3] @ cam)
            viewmats.append(vm)
            Ks.append(K)

    means = np.concatenate(means_list)
    colors_all = np.concatenate(colors_list)
    m = means.shape[0]
    quats = rng.normal(size=(m, 4)).astype(np.float32)
    scales = rng.uniform(0.02, 0.12, size=(m, 3)).astype(np.float32)
    opacities = rng.uniform(0.4, 1.0, size=(m,)).astype(np.float32)
    return (
        means, quats, scales, opacities, colors_all,
        np.stack(viewmats), np.stack(Ks), width, height,
    )


def make_colmap_test_scene(root, n_images=8, width=64, height=48,
                           n_pts=120, seed=7):
    """Write a synthetic COLMAP scene (sparse/0 bin files + images) whose
    images are actual 3DGS renders — trainable end-to-end, used by the
    trainer tests and the benchmark harness's procedural fallback
    (reference workflow: examples/benchmarks/*.sh on MipNeRF-360 scenes)."""
    import os
    import struct

    import numpy as np
    from PIL import Image
    import jax.numpy as jnp

    from tdgs.rendering import rasterization

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    sparse = os.path.join(root, "sparse", "0")

    pts = rng.normal(size=(n_pts, 3)).astype(np.float32) * 0.4 + [0, 0, 4.0]
    cols = rng.uniform(0.2, 1.0, size=(n_pts, 3)).astype(np.float32)

    f = 70.0 * (width / 64.0)
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32)
    viewmats = []
    for i in range(n_images):
        vm = np.eye(4, dtype=np.float32)
        vm[0, 3] = 0.4 * np.cos(2 * np.pi * i / n_images)
        vm[1, 3] = 0.4 * np.sin(2 * np.pi * i / n_images)
        viewmats.append(vm)
    viewmats = np.stack(viewmats)

    # ground-truth gaussians at the points
    quats = np.tile([1.0, 0, 0, 0], (n_pts, 1)).astype(np.float32)
    scales = np.full((n_pts, 3), 0.06, np.float32)
    opac = np.full((n_pts,), 0.95, np.float32)
    img, _, _ = rasterization(
        jnp.asarray(pts), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(cols), jnp.asarray(viewmats),
        jnp.asarray(np.tile(K, (n_images, 1, 1))), width, height,
        backgrounds=jnp.zeros((n_images, 3)),
    )
    img = np.clip(np.asarray(img), 0, 1)

    with open(os.path.join(sparse, "cameras.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", 1))
        fd.write(struct.pack("<iiQQ", 1, 1, width, height))
        fd.write(struct.pack("<4d", f, f, width / 2, height / 2))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            fd.write(struct.pack("<q", i + 1))
            fd.write(struct.pack("<3d", *pts[i]))
            fd.write(struct.pack("<3B", *(cols[i] * 255).astype(np.uint8)))
            fd.write(struct.pack("<d", 0.5))
            fd.write(struct.pack("<Q", 0))
    with open(os.path.join(sparse, "images.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            name = f"img_{i:03d}.png"
            fd.write(struct.pack("<i", i + 1))
            fd.write(struct.pack("<4d", 1.0, 0, 0, 0))
            fd.write(struct.pack("<3d", *viewmats[i, :3, 3]))
            fd.write(struct.pack("<i", 1))
            fd.write(name.encode() + b"\x00")
            fd.write(struct.pack("<Q", 0))
            Image.fromarray((img[i] * 255).astype(np.uint8)).save(
                os.path.join(root, "images", name)
            )
