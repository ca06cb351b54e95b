"""Learnable bilateral grids for per-image exposure/color correction.

Capability parity with the reference's examples/lib_bilagrid.py (from
"Bilateral Guided Radiance Field Processing", adapted for 3DGS):
- a per-image 3D grid (W×H×guidance) of 3x4 affine color transforms,
- trilinear ``slice`` at (pixel x, pixel y, luma) applying the affine,
- total-variation regularizer,
- ``color_correct``: post-hoc least-squares affine fit used at eval.
Pure jnp (the reference's F.grid_sample becomes explicit trilinear
interpolation that fuses under jit).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_LUMA = jnp.array([0.299, 0.587, 0.114])


def init_bilateral_grid(
    n_images: int, grid_w: int = 16, grid_h: int = 16, grid_g: int = 8
) -> jnp.ndarray:
    """Identity-initialized grids [n, grid_h, grid_w, grid_g, 12]."""
    ident = jnp.array([1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0])
    return jnp.broadcast_to(
        ident, (n_images, grid_h, grid_w, grid_g, 12)
    ).astype(jnp.float32)


def bilateral_grid_slice(
    grids: jnp.ndarray,  # [n, gh, gw, gg, 12]
    image_ids: jnp.ndarray,  # [B]
    rgb: jnp.ndarray,  # [B, H, W, 3] rendered colors in [0, 1]
) -> jnp.ndarray:
    """Apply each image's grid to its render (trilinear in x, y, luma)."""
    n, gh, gw, gg, _ = grids.shape
    B, H, W, _ = rgb.shape
    g = grids[image_ids]  # [B, gh, gw, gg, 12]

    y = (jnp.arange(H) + 0.5) / H * (gh - 1)
    x = (jnp.arange(W) + 0.5) / W * (gw - 1)
    xx = jnp.broadcast_to(x[None, None, :], (B, H, W))
    yy = jnp.broadcast_to(y[None, :, None], (B, H, W))
    luma = jnp.clip(jnp.einsum("bhwc,c->bhw", rgb, _LUMA), 0.0, 1.0)
    zz = luma * (gg - 1)

    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, gw - 1)
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, gh - 1)
    z0 = jnp.clip(jnp.floor(zz).astype(jnp.int32), 0, gg - 1)
    x1 = jnp.minimum(x0 + 1, gw - 1)
    y1 = jnp.minimum(y0 + 1, gh - 1)
    z1 = jnp.minimum(z0 + 1, gg - 1)
    fx = (xx - x0)[..., None]
    fy = (yy - y0)[..., None]
    fz = (zz - z0)[..., None]

    b = jnp.arange(B)[:, None, None]

    def at(yi, xi, zi):
        return g[b, yi, xi, zi]  # [B, H, W, 12]

    c000 = at(y0, x0, z0)
    c001 = at(y0, x0, z1)
    c010 = at(y0, x1, z0)
    c011 = at(y0, x1, z1)
    c100 = at(y1, x0, z0)
    c101 = at(y1, x0, z1)
    c110 = at(y1, x1, z0)
    c111 = at(y1, x1, z1)
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fx) + c01 * fx
    c1 = c10 * (1 - fx) + c11 * fx
    aff = (c0 * (1 - fy) + c1 * fy).reshape(B, H, W, 3, 4)

    out = jnp.einsum("bhwij,bhwj->bhwi", aff[..., :3], rgb) + aff[..., 3]
    return out


def total_variation_loss(grids: jnp.ndarray) -> jnp.ndarray:
    """TV regularizer over the grid dims (reference lib_bilagrid.py:161)."""
    tv = 0.0
    for axis in (1, 2, 3):
        d = jnp.diff(grids, axis=axis)
        tv = tv + jnp.mean(d**2)
    return tv


def color_correct(
    img: jnp.ndarray,  # [..., H, W, 3] prediction
    ref: jnp.ndarray,  # [..., H, W, 3] ground truth
    num_iters: int = 5,
    eps: float = 0.5 / 255,
) -> jnp.ndarray:
    """Per-image least-squares affine color fit of img → ref
    (reference lib_bilagrid.py:color_correct:56), used to report cc_psnr."""
    shape = img.shape
    x = img.reshape(-1, 3)
    y = ref.reshape(-1, 3)
    A = jnp.concatenate([x, jnp.ones_like(x[:, :1])], axis=1)  # [M, 4]
    # normal equations with small ridge for stability
    AtA = A.T @ A + 1e-6 * jnp.eye(4)
    AtY = A.T @ y
    W = jnp.linalg.solve(AtA, AtY)  # [4, 3]
    out = A @ W
    return jnp.clip(out.reshape(shape), 0.0, 1.0)
