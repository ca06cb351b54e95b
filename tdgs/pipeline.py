"""Rigid-body pipeline glue: splat scene model + per-cluster transforms.

Counterpart of the reference's root-level main.py pipeline
(GaussianModel:19, load_splats_from_ply:91 with SH zero-padding :100-129,
quat_multiply:173, apply_transform:183-228): load a trained PLY, select
clustered splats, apply per-cluster SE(3) transforms, render. The physics
stage (absent in the reference) lives in tdgs.physics and plugs in through
the same (translation, rotation_quat) interface.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdgs.models.gaussians import SplatParams, num_sh_coeffs
from tdgs.ops.transforms import quat_mul, quat_normalize, quat_rotate
from tdgs.rendering import rasterization
from tdgs.utils.ply import load_ply


def quat_multiply(q1, q2):
    """wxyz Hamilton product (reference main.py:173)."""
    return quat_mul(q1, q2)


class GaussianModel:
    """Splat scene loaded from PLY (reference main.py:GaussianModel:19)."""

    def __init__(self, sh_degree: int = 3):
        self.max_sh_degree = sh_degree
        self.splats: Optional[Dict[str, jnp.ndarray]] = None

    def load_splats_from_ply(self, path: str) -> Dict[str, jnp.ndarray]:
        """Load a 3DGS PLY; zero-pad SH rest bands up to max_sh_degree
        (reference main.py:100-129)."""
        raw = load_ply(path)
        k_target = num_sh_coeffs(self.max_sh_degree) - 1
        shN = raw["shN"]
        if shN.shape[1] < k_target:
            pad = np.zeros((shN.shape[0], k_target - shN.shape[1], 3), np.float32)
            shN = np.concatenate([shN, pad], axis=1)
        self.splats = {
            "means": jnp.asarray(raw["means"]),
            "scales": jnp.asarray(raw["scales"]),
            "quats": jnp.asarray(raw["quats"]),
            "opacities": jnp.asarray(raw["opacities"]),
            "sh0": jnp.asarray(raw["sh0"]),
            "shN": jnp.asarray(shN),
        }
        for k, v in raw.items():
            if k not in self.splats:
                self.splats[k] = jnp.asarray(v)
        return self.splats

    def select(self, indices: np.ndarray) -> Dict[str, jnp.ndarray]:
        """Subset of splats by gaussian indices (reference main.py:293-297)."""
        return {k: v[jnp.asarray(indices)] for k, v in self.splats.items()}


def apply_transform(
    splats: SplatParams,
    translation: jnp.ndarray,  # [3]
    rotation_quat: jnp.ndarray,  # [4] wxyz
    indices: Optional[jnp.ndarray] = None,  # subset to transform (None = all)
    center: Optional[jnp.ndarray] = None,  # rotation center (None = centroid)
) -> SplatParams:
    """Rigid SE(3) transform of (a subset of) splats — API parity with the
    reference's apply_transform (main.py:183-228): rotate means about the
    cluster centroid, compose quats (which also rotates covariances, since
    Σ = R(q)·S·Sᵀ·R(q)ᵀ), then translate."""
    q = quat_normalize(rotation_quat)
    means = splats["means"]
    quats = splats["quats"]
    if indices is None:
        sel_means = means
    else:
        sel_means = means[indices]
    if center is None:
        center = sel_means.mean(axis=0)
    new_sel_means = quat_rotate(q[None], sel_means - center) + center + translation
    if indices is None:
        new_means = new_sel_means
        new_quats = quat_mul(q[None], quats)
    else:
        new_means = means.at[indices].set(new_sel_means)
        new_quats = quats.at[indices].set(quat_mul(q[None], quats[indices]))
    return dict(splats, means=new_means, quats=new_quats)


def render_splats(
    splats: SplatParams,
    viewmat: np.ndarray,  # [4, 4]
    K: np.ndarray,  # [3, 3]
    width: int,
    height: int,
    sh_degree: int = 3,
    rasterizer: str = "auto",
    backgrounds=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render raw-parameter splats with standard activations
    (reference Runner.rasterize_splats used by main.py:328-344)."""
    if rasterizer == "auto":
        # render-only path: the forward-only kernel skips the realignment
        # pass (~25% faster per frame than "packed")
        rasterizer = (
            "packed_inference" if jax.default_backend() == "tpu" else "jax"
        )
    sh = jnp.concatenate([splats["sh0"], splats["shN"]], axis=-2)
    img, alpha, _ = rasterization(
        splats["means"],
        splats["quats"],
        jnp.exp(splats["scales"]),
        jax.nn.sigmoid(splats["opacities"]),
        sh,
        jnp.asarray(viewmat)[None],
        jnp.asarray(K)[None],
        width,
        height,
        sh_degree=sh_degree,
        rasterizer=rasterizer,
        backgrounds=backgrounds,
    )
    return img[0], alpha[0]
