"""2DGS (surfel splat) projection — pure jnp.

Replaces gsplat/cuda/csrc/Projection2DGSFused.cu (+oracle
_torch_impl_2dgs.py:_fully_fused_projection_2dgs): builds the ray-space
transform M = (K [R·quat_rot·diag(sx,sy) | t])ᵀ per (camera, gaussian),
camera-space surfel normals (sign-flipped toward the camera), and the
screen-space AABB from the homogeneous center/extent identities.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from tdgs.ops.transforms import quat_to_rotmat


def fully_fused_projection_2dgs(
    means: jnp.ndarray,  # [..., N, 3]
    quats: jnp.ndarray,  # [..., N, 4]
    scales: jnp.ndarray,  # [..., N, 3] (z unused)
    viewmats: jnp.ndarray,  # [..., C, 4, 4]
    Ks: jnp.ndarray,  # [..., C, 3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (radii [..., C, N, 2] int32, means2d, depths,
    ray_transforms M [..., C, N, 3, 3], normals [..., C, N, 3])."""
    R_cw = viewmats[..., :3, :3]
    t_cw = viewmats[..., :3, 3]
    means_c = (
        jnp.einsum("...cij,...nj->...cni", R_cw, means, precision="highest")
        + t_cw[..., :, None, :]
    )  # [..., C, N, 3]

    R_wl = quat_to_rotmat(quats)  # [..., N, 3, 3]
    RS_wl = R_wl * scales[..., None, :]
    RS_cl = jnp.einsum(
        "...cij,...njk->...cnik", R_cw, RS_wl, precision="highest"
    )  # [..., C, N, 3, 3]

    # surfel normal = third column (z axis of local frame), toward camera
    normals = RS_cl[..., 2]  # [..., C, N, 3]
    cos = -jnp.einsum("...i,...i->...", normals, means_c)
    normals = normals * jnp.where(cos > 0, 1.0, -1.0)[..., None]

    # T_sl = K [RS[:, :2] | mean_c]; M = T_slᵀ
    T_cl = jnp.concatenate([RS_cl[..., :2], means_c[..., None]], axis=-1)
    T_sl = jnp.einsum("...cij,...cnjk->...cnik", Ks, T_cl, precision="highest")
    M = jnp.swapaxes(T_sl, -1, -2)  # [..., C, N, 3, 3]

    # screen-space center + extent via the homogeneous plane identities
    test = jnp.array([1.0, 1.0, -1.0])
    d = jnp.sum(M[..., 2] * M[..., 2] * test, axis=-1, keepdims=True)
    valid = jnp.abs(d)[..., 0] > eps
    f = jnp.where(jnp.abs(d) > eps, test / jnp.where(d == 0, 1.0, d), 0.0)[
        ..., None
    ]  # [..., C, N, 3, 1]
    means2d = jnp.sum(M[..., :2] * M[..., 2:3] * f, axis=-2)
    extents = jnp.sqrt(
        jnp.maximum(
            means2d**2 - jnp.sum(M[..., :2] * M[..., :2] * f, axis=-2), 1e-4
        )
    )

    depths = means_c[..., 2]
    radius = jnp.ceil(3.33 * extents)

    valid = valid & (depths > near_plane) & (depths < far_plane)
    valid = valid & ~(
        (radius[..., 0] <= radius_clip) & (radius[..., 1] <= radius_clip)
    )
    valid = valid & (
        (means2d[..., 0] + radius[..., 0] > 0)
        & (means2d[..., 0] - radius[..., 0] < width)
        & (means2d[..., 1] + radius[..., 1] > 0)
        & (means2d[..., 1] - radius[..., 1] < height)
    )
    radii = jnp.where(valid[..., None], radius, 0.0).astype(jnp.int32)
    return radii, means2d, depths, M, normals
