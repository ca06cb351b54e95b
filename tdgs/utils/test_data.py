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
