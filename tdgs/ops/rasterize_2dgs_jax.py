"""2DGS tile rasterizer (pure jnp, prefix-product compositing).

Replaces gsplat/cuda/csrc/RasterizeToPixels2DGSFwd.cu/Bwd.cu (+oracle
_torch_impl_2dgs.py:accumulate_2dgs): ray-splat intersection through the
ray_transforms matrix M, the min(3D, 2D-lowpass) sigma rule, and the extra
outputs — accumulated normals, the Mip-NeRF-360 distortion term, and median
depth. All sequential per-pixel accumulations become parallel prefix
sums/products (see tdgs.ops.rasterize_jax for the derivation).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from tdgs.ops.projection import ALPHA_THRESHOLD
from tdgs.ops.rasterize_jax import (
    ALPHA_CLAMP,
    TRANSMITTANCE_EPS,
    absgrad_tap,
    gather_tile_gaussians,
)


def rasterize_to_pixels_2dgs_jax(
    means2d: jnp.ndarray,  # [..., N, 2]
    ray_transforms: jnp.ndarray,  # [..., N, 3, 3]
    colors: jnp.ndarray,  # [..., N, D] (last channel = depth if distloss)
    normals: jnp.ndarray,  # [..., N, 3]
    opacities: jnp.ndarray,  # [..., N]
    image_width: int,
    image_height: int,
    tile_size: int,
    isect_offsets: jnp.ndarray,  # [..., tile_height, tile_width]
    flatten_ids: jnp.ndarray,  # [capacity]
    n_isects: jnp.ndarray,
    backgrounds: Optional[jnp.ndarray] = None,  # [..., D]
    tile_capacity: int = 512,
    compute_distort: bool = False,
    absgrad_dummy: Optional[jnp.ndarray] = None,  # [I*N, 2] zeros
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (render_colors [..., H, W, D], render_alphas [..., H, W, 1],
    render_normals [..., H, W, 3] (camera frame), render_distort
    [..., H, W, 1], render_median [..., H, W, 1]).

    ``absgrad_dummy``: optional zeros whose gradient accumulates
    |per-(gaussian, tile) screen gradients| (AbsGS, reference
    RasterizeToPixels2DGSBwd.cu v_means2d_abs / rendering.py:1290 absgrad;
    see rasterize_jax.absgrad_tap)."""
    image_dims = means2d.shape[:-2]
    N = means2d.shape[-2]
    D = colors.shape[-1]
    I = math.prod(image_dims) if image_dims else 1
    tile_height, tile_width = isect_offsets.shape[-2:]

    means2d_f = means2d.reshape(I * N, 2)
    M_f = ray_transforms.reshape(I * N, 3, 3)
    colors_f = colors.reshape(I * N, D)
    normals_f = normals.reshape(I * N, 3)
    opac_f = opacities.reshape(I * N)

    gauss_ids, valid = gather_tile_gaussians(
        isect_offsets.reshape(I, tile_height, tile_width),
        flatten_ids, n_isects, tile_capacity,
    )  # [T, cap]
    T_tiles = gauss_ids.shape[0]

    g_means = means2d_f[gauss_ids]  # [T, cap, 2]
    if absgrad_dummy is not None:
        g_means = absgrad_tap(g_means, absgrad_dummy, gauss_ids, valid)
    g_M = M_f[gauss_ids]  # [T, cap, 3, 3]
    g_colors = colors_f[gauss_ids]
    g_normals = normals_f[gauss_ids]
    g_opac = opac_f[gauss_ids]

    tiles_per_image = tile_height * tile_width
    tile_ids = jnp.arange(T_tiles, dtype=jnp.int32)
    t_in_img = tile_ids % tiles_per_image
    tx = (t_in_img % tile_width) * tile_size
    ty = (t_in_img // tile_width) * tile_size
    p = jnp.arange(tile_size * tile_size, dtype=jnp.int32)
    px = (tx[:, None] + p[None, :] % tile_size).astype(jnp.float32) + 0.5
    py = (ty[:, None] + p[None, :] // tile_size).astype(jnp.float32) + 0.5
    # [T, P]

    # ray-splat intersection (accumulate_2dgs): h_u = -M0 + M2·px,
    # h_v = -M1 + M2·py, (u,v) from h_u × h_v
    M0 = g_M[:, None, :, 0, :]  # [T, 1, cap, 3]
    M1 = g_M[:, None, :, 1, :]
    M2 = g_M[:, None, :, 2, :]
    h_u = -M0 + M2 * px[:, :, None, None]  # [T, P, cap, 3]
    h_v = -M1 + M2 * py[:, :, None, None]
    tmp = jnp.cross(h_u, h_v)
    # sanitize the denominator BEFORE dividing: jnp.where alone doesn't
    # block NaN/inf gradients of the unselected branch
    bad = jnp.abs(tmp[..., 2]) < 1e-9
    tz = jnp.where(bad, 1.0, tmp[..., 2])
    us = tmp[..., 0] / tz
    vs = tmp[..., 1] / tz
    sigma3d = jnp.where(bad, 1e6, us * us + vs * vs)
    dx = px[:, :, None] - g_means[:, None, :, 0]
    dy = py[:, :, None] - g_means[:, None, :, 1]
    sigma2d = 2.0 * (dx * dx + dy * dy)
    sigma = 0.5 * jnp.minimum(sigma3d, sigma2d)  # [T, P, cap]

    alpha = jnp.minimum(ALPHA_CLAMP, g_opac[:, None, :] * jnp.exp(-sigma))
    skip = (alpha < ALPHA_THRESHOLD) | ~valid[:, None, :]
    alpha = jnp.where(skip, 0.0, alpha)

    one_minus = 1.0 - alpha
    Pcum = jnp.cumprod(one_minus, axis=-1)
    included = Pcum > TRANSMITTANCE_EPS
    T_prev = Pcum / one_minus
    w = jnp.where(included, alpha * T_prev, 0.0)  # vis
    T_out = jnp.prod(jnp.where(included, one_minus, 1.0), axis=-1)

    rendered = jnp.einsum("tpk,tkd->tpd", w, g_colors, precision="highest")
    rnormal = jnp.einsum("tpk,tkd->tpd", w, g_normals, precision="highest")

    # distortion (Mip-NeRF 360): 2 Σ_i w_i (d_i·A_i − B_i), A/B exclusive
    # prefixes of w and w·d (Fwd.cu:389-399; depth = last color channel)
    depth_ch = g_colors[..., -1][:, None, :] * jnp.ones_like(w)
    A_incl = jnp.cumsum(w, axis=-1)
    A_excl = A_incl - w
    B_incl = jnp.cumsum(w * depth_ch, axis=-1)
    B_excl = B_incl - w * depth_ch
    distort = jnp.sum(2.0 * w * (depth_ch * A_excl - B_excl), axis=-1)
    if not compute_distort:
        distort = jnp.zeros_like(distort)

    # median depth: last accumulated entry with pre-T > 0.5 (Fwd.cu:402-405)
    med_mask = (T_prev > 0.5) & (w > 0.0)
    kidx = jnp.arange(w.shape[-1])
    last_med = jnp.max(jnp.where(med_mask, kidx, -1), axis=-1)  # [T, P]
    med_depth = jnp.take_along_axis(
        depth_ch, jnp.maximum(last_med, 0)[..., None], axis=-1
    )[..., 0]
    med_depth = jnp.where(last_med >= 0, med_depth, 0.0)

    def untile(x, ch):
        img = x.reshape(I, tile_height, tile_width, tile_size, tile_size, ch)
        img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
            I, tile_height * tile_size, tile_width * tile_size, ch
        )
        return img[:, :image_height, :image_width]

    img = untile(rendered, D)
    nrm = untile(rnormal, 3)
    alp = 1.0 - untile(T_out[..., None], 1)
    dst = untile(distort[..., None], 1)
    med = untile(med_depth[..., None], 1)

    if backgrounds is not None:
        img = img + (1.0 - alp) * backgrounds.reshape(I, 1, 1, D)

    shp = image_dims + (image_height, image_width)
    return (
        img.reshape(shp + (D,)),
        alp.reshape(shp + (1,)),
        nrm.reshape(shp + (3,)),
        dst.reshape(shp + (1,)),
        med.reshape(shp + (1,)),
    )
