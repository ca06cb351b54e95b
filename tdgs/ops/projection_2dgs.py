"""2DGS (surfel splat) projection — pure jnp.

Replaces gsplat/cuda/csrc/Projection2DGSFused.cu (+oracle
_torch_impl_2dgs.py:_fully_fused_projection_2dgs): builds the ray-space
transform M = (K [R·quat_rot·diag(sx,sy) | t])ᵀ per (camera, gaussian),
camera-space surfel normals (sign-flipped toward the camera), and the
screen-space AABB from the homogeneous center/extent identities.

Structure-of-arrays: the whole chain is kept as per-component [.., C, N]
arrays (rotation components → camera-frame surfel axes → ray-space
transform entries) and only the M output is stacked at the end — the
einsum form lowered tiny [3,3] batched matmuls through XLA's conv
emitter with layout copies (~10 ms/step at N=200k measured on the 3DGS
projection; same shape class here).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from tdgs.ops.transforms import quat_to_rotmat_comps


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
    # camera-frame means, componentwise ([..., C, N] each)
    x = means[..., None, :, 0]
    y = means[..., None, :, 1]
    z = means[..., None, :, 2]
    W = [[viewmats[..., i, j, None] for j in range(3)] for i in range(3)]
    t = [viewmats[..., i, 3, None] for i in range(3)]
    mc = [W[i][0] * x + W[i][1] * y + W[i][2] * z + t[i] for i in range(3)]

    # world-frame scaled surfel axes: columns 0..2 of R·diag(sx, sy, sz)
    r = quat_to_rotmat_comps(quats)  # r00..r22, [..., N]
    s0 = scales[..., 0]
    s1 = scales[..., 1]
    s2 = scales[..., 2]
    # RS_wl[k][j] = R[k][j] * s_j
    RS_wl = [
        [r[3 * k + 0] * s0, r[3 * k + 1] * s1, r[3 * k + 2] * s2]
        for k in range(3)
    ]
    # camera-frame axes: RS_cl[i][j] = Σ_k W[i][k] · RS_wl[k][j]
    RS_cl = [
        [
            W[i][0] * RS_wl[0][j] + W[i][1] * RS_wl[1][j]
            + W[i][2] * RS_wl[2][j]
            for j in range(3)
        ]
        for i in range(3)
    ]

    # surfel normal = third column (z axis of local frame), toward camera
    cos = -(RS_cl[0][2] * mc[0] + RS_cl[1][2] * mc[1] + RS_cl[2][2] * mc[2])
    flip = jnp.where(cos > 0, 1.0, -1.0)
    normals = jnp.stack(
        [RS_cl[0][2] * flip, RS_cl[1][2] * flip, RS_cl[2][2] * flip], axis=-1
    )  # [..., C, N, 3]

    # T_sl = K [RS[:, :2] | mean_c]; T_cl[i] = (RS_cl[i][0], RS_cl[i][1], mc[i])
    fx = Ks[..., 0, 0, None]
    fy = Ks[..., 1, 1, None]
    cx = Ks[..., 0, 2, None]
    cy = Ks[..., 1, 2, None]
    T_cl = [[RS_cl[i][0], RS_cl[i][1], mc[i]] for i in range(3)]
    T_sl = [
        [fx * T_cl[0][j] + cx * T_cl[2][j] for j in range(3)],
        [fy * T_cl[1][j] + cy * T_cl[2][j] for j in range(3)],
        T_cl[2],
    ]
    # M = T_slᵀ: M[i][j] = T_sl[j][i]
    M = jnp.stack(
        [
            jnp.stack([T_sl[j][i] for j in range(3)], axis=-1)
            for i in range(3)
        ],
        axis=-2,
    )  # [..., C, N, 3, 3]

    # screen-space center + extent via the homogeneous plane identities:
    # with h_r = T_sl[2][r] (= M column 2) and test = (1, 1, -1),
    # d = Σ_r h_r² test_r,  f_r = test_r / d,
    # means2d_k = Σ_r T_sl[k][r] h_r f_r,
    # extent²_k = means2d_k² − Σ_r T_sl[k][r]² f_r
    h = T_sl[2]
    d = h[0] * h[0] + h[1] * h[1] - h[2] * h[2]
    valid = jnp.abs(d) > eps
    d_safe = jnp.where(d == 0, 1.0, d)
    f = [
        jnp.where(jnp.abs(d) > eps, test_r / d_safe, 0.0)
        for test_r in (1.0, 1.0, -1.0)
    ]
    m2d = [
        T_sl[k][0] * h[0] * f[0] + T_sl[k][1] * h[1] * f[1]
        + T_sl[k][2] * h[2] * f[2]
        for k in range(2)
    ]
    ext = [
        jnp.sqrt(
            jnp.maximum(
                m2d[k] * m2d[k]
                - (
                    T_sl[k][0] * T_sl[k][0] * f[0]
                    + T_sl[k][1] * T_sl[k][1] * f[1]
                    + T_sl[k][2] * T_sl[k][2] * f[2]
                ),
                1e-4,
            )
        )
        for k in range(2)
    ]
    means2d = jnp.stack(m2d, axis=-1)

    depths = mc[2]
    radius_x = jnp.ceil(3.33 * ext[0])
    radius_y = jnp.ceil(3.33 * ext[1])

    valid = valid & (depths > near_plane) & (depths < far_plane)
    valid = valid & ~(
        (radius_x <= radius_clip) & (radius_y <= radius_clip)
    )
    valid = valid & (
        (m2d[0] + radius_x > 0)
        & (m2d[0] - radius_x < width)
        & (m2d[1] + radius_y > 0)
        & (m2d[1] - radius_y < height)
    )
    radii = jnp.where(
        valid[..., None], jnp.stack([radius_x, radius_y], axis=-1), 0.0
    ).astype(jnp.int32)
    return radii, means2d, depths, M, normals
