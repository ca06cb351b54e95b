"""Depth-map geometry utilities (pure jnp).

Capability parity with gsplat/utils.py: depth_to_points (:145),
depth_to_normal (:209), log_transform (:137), get_projection_matrix (:235).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_transform(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def inverse_log_transform(y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sign(y) * jnp.expm1(jnp.abs(y))


def depth_to_points(
    depths: jnp.ndarray,  # [..., H, W, 1] z-depth
    camtoworlds: jnp.ndarray,  # [..., 4, 4]
    Ks: jnp.ndarray,  # [..., 3, 3]
) -> jnp.ndarray:
    """Unproject a z-depth map to world-space points [..., H, W, 3]."""
    H, W = depths.shape[-3:-1]
    x = jnp.arange(W, dtype=depths.dtype) + 0.5
    y = jnp.arange(H, dtype=depths.dtype) + 0.5
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    fx = Ks[..., 0, 0][..., None, None]
    fy = Ks[..., 1, 1][..., None, None]
    cx = Ks[..., 0, 2][..., None, None]
    cy = Ks[..., 1, 2][..., None, None]
    z = depths[..., 0]
    px = (xx - cx) / fx * z
    py = (yy - cy) / fy * z
    pts_c = jnp.stack([px, py, z], axis=-1)  # [..., H, W, 3]
    R = camtoworlds[..., :3, :3]
    t = camtoworlds[..., :3, 3]
    return (
        jnp.einsum("...ij,...hwj->...hwi", R, pts_c, precision="highest")
        + t[..., None, None, :]
    )


def depth_to_normal(
    depths: jnp.ndarray,  # [..., H, W, 1]
    camtoworlds: jnp.ndarray,  # [..., 4, 4]
    Ks: jnp.ndarray,  # [..., 3, 3]
) -> jnp.ndarray:
    """Screen-space finite-difference normals from a depth map
    (world frame, zero on the 1-px border) [..., H, W, 3]."""
    pts = depth_to_points(depths, camtoworlds, Ks)
    dx = pts[..., 2:, 1:-1, :] - pts[..., :-2, 1:-1, :]
    dy = pts[..., 1:-1, 2:, :] - pts[..., 1:-1, :-2, :]
    n = jnp.cross(dx, dy)
    # rsqrt(Σn²+ε): jnp.linalg.norm has a NaN gradient at exactly 0 (flat
    # depth regions / zero borders produce zero cross products)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    pad = [(0, 0)] * (n.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    return jnp.pad(n, pad)


def get_projection_matrix(
    znear: float, zfar: float, fovx: float, fovy: float
) -> jnp.ndarray:
    """OpenGL-style projection matrix (gsplat/utils.py:235)."""
    import math

    t = znear * math.tan(0.5 * fovy)
    b = -t
    r = znear * math.tan(0.5 * fovx)
    l = -r
    return jnp.array(
        [
            [2 * znear / (r - l), 0.0, (r + l) / (r - l), 0.0],
            [0.0, 2 * znear / (t - b), (t + b) / (t - b), 0.0],
            [0.0, 0.0, zfar / (zfar - znear), -(zfar * znear) / (zfar - znear)],
            [0.0, 0.0, 1.0, 0.0],
        ]
    )
