"""Index rasterization + composition over explicit intersection lists.

Parity with the reference's "slow reference path"
(gsplat/cuda/csrc/RasterizeToIndices3DGS.cu + _wrapper.py:
rasterize_to_indices_in_range:852-932 and _torch_impl.py:accumulate:506):
emit the (gaussian, pixel, image) intersections within a depth-sorted batch
range — resumable via input transmittances — and alpha-composite over such
lists with plain autodiff. Used as a playground/debugging path, not the
production kernel.

JAX redesign: the dynamic-length intersection lists become fixed-capacity
arrays + a validity mask (the usual static-shape contract).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tdgs.ops.projection import ALPHA_THRESHOLD
from tdgs.ops.rasterize_jax import (
    ALPHA_CLAMP,
    TRANSMITTANCE_EPS,
    gather_tile_gaussians,
)


def rasterize_to_indices_in_range(
    range_start: int,
    range_end: int,
    transmittances: jnp.ndarray,  # [..., H, W] current per-pixel T
    means2d: jnp.ndarray,  # [..., N, 2]
    conics: jnp.ndarray,  # [..., N, 3]
    opacities: jnp.ndarray,  # [..., N]
    image_width: int,
    image_height: int,
    tile_size: int,
    isect_offsets: jnp.ndarray,  # [..., tile_height, tile_width]
    flatten_ids: jnp.ndarray,  # [capacity]
    n_isects: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (gaussian_ids, pixel_ids, image_ids, valid) — flattened
    per-(pixel, batch-slot) intersection lists for gaussian batches
    [range_start·B, range_end·B) of each tile (B = tile_size²), including
    only contributions where α ≥ 1/255 and the running T > 1e-4."""
    image_dims = means2d.shape[:-2]
    N = means2d.shape[-2]
    I = math.prod(image_dims) if image_dims else 1
    th, tw = isect_offsets.shape[-2:]
    block = tile_size * tile_size
    s0 = range_start * block
    cap = (range_end - range_start) * block

    gauss_ids, in_tile = gather_tile_gaussians(
        isect_offsets.reshape(I, th, tw), flatten_ids, n_isects,
        s0 + cap,
    )
    gauss_ids = gauss_ids[:, s0:]
    in_tile = in_tile[:, s0:]

    means2d_f = means2d.reshape(I * N, 2)
    conics_f = conics.reshape(I * N, 3)
    opac_f = opacities.reshape(I * N)
    g_means = means2d_f[gauss_ids]  # [T, cap, 2]
    g_conics = conics_f[gauss_ids]
    g_opac = opac_f[gauss_ids]

    T_tiles = gauss_ids.shape[0]
    tiles_per_image = th * tw
    tids = jnp.arange(T_tiles, dtype=jnp.int32)
    t_in_img = tids % tiles_per_image
    img_of_tile = tids // tiles_per_image
    tx = (t_in_img % tw) * tile_size
    ty = (t_in_img // tw) * tile_size
    p = jnp.arange(block, dtype=jnp.int32)
    px = (tx[:, None] + p[None, :] % tile_size).astype(jnp.float32) + 0.5
    py = (ty[:, None] + p[None, :] // tile_size).astype(jnp.float32) + 0.5

    dx = g_means[:, None, :, 0] - px[:, :, None]  # [T, P, cap]
    dy = g_means[:, None, :, 1] - py[:, :, None]
    ca, cb, cc = (g_conics[:, None, :, i] for i in range(3))
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, g_opac[:, None, :] * jnp.exp(-sigma))
    live = ~((sigma < 0.0) | (alpha < ALPHA_THRESHOLD) | ~in_tile[:, None, :])
    alpha = jnp.where(live, alpha, 0.0)

    # resume transmittance and apply the 1e-4 cutoff within this range
    trans = transmittances.reshape(I, image_height, image_width)
    pix_x = jnp.clip(px.astype(jnp.int32), 0, image_width - 1)
    pix_y = jnp.clip(py.astype(jnp.int32), 0, image_height - 1)
    T_in = trans[img_of_tile[:, None], pix_y, pix_x]  # [T, P]
    P_raw = T_in[..., None] * jnp.cumprod(1.0 - alpha, axis=-1)
    included = (P_raw > TRANSMITTANCE_EPS) & live

    pix_id = (pix_y * image_width + pix_x).astype(jnp.int32)  # [T, P]
    out_g = jnp.broadcast_to(gauss_ids[:, None, :], included.shape)
    out_p = jnp.broadcast_to(pix_id[..., None], included.shape)
    out_i = jnp.broadcast_to(
        img_of_tile[:, None, None], included.shape
    ).astype(jnp.int32)
    # inside-image filter for boundary tiles
    inside = (px < image_width)[:, :, None] & (py < image_height)[:, :, None]
    valid = included & inside
    return (
        (out_g % N).reshape(-1),
        out_p.reshape(-1),
        out_i.reshape(-1),
        valid.reshape(-1),
    )


def _sigma_2dgs(M, means2d, px, py):
    """2DGS ray-splat sigma for per-entry transforms M [..., 3, 3] and
    pixel centers px/py [...]; the min(3D, 2D-lowpass) rule of
    RasterizeToPixels2DGSFwd.cu / _torch_impl_2dgs.accumulate_2dgs:94."""
    h_u = -M[..., 0, :] + M[..., 2, :] * px[..., None]
    h_v = -M[..., 1, :] + M[..., 2, :] * py[..., None]
    tmp = jnp.cross(h_u, h_v)
    bad = jnp.abs(tmp[..., 2]) < 1e-9
    tz = jnp.where(bad, 1.0, tmp[..., 2])
    us = tmp[..., 0] / tz
    vs = tmp[..., 1] / tz
    sigma3d = jnp.where(bad, 1e6, us * us + vs * vs)
    dx = px - means2d[..., 0]
    dy = py - means2d[..., 1]
    sigma2d = 2.0 * (dx * dx + dy * dy)
    return 0.5 * jnp.minimum(sigma3d, sigma2d)


def rasterize_to_indices_in_range_2dgs(
    range_start: int,
    range_end: int,
    transmittances: jnp.ndarray,  # [..., H, W]
    means2d: jnp.ndarray,  # [..., N, 2]
    ray_transforms: jnp.ndarray,  # [..., N, 3, 3]
    opacities: jnp.ndarray,  # [..., N]
    image_width: int,
    image_height: int,
    tile_size: int,
    isect_offsets: jnp.ndarray,  # [..., tile_height, tile_width]
    flatten_ids: jnp.ndarray,  # [capacity]
    n_isects: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """2DGS variant of rasterize_to_indices_in_range (reference
    RasterizeToIndices2DGS.cu): identical batching/cutoff semantics, sigma
    from the surfel ray transforms."""
    image_dims = means2d.shape[:-2]
    N = means2d.shape[-2]
    I = math.prod(image_dims) if image_dims else 1
    th, tw = isect_offsets.shape[-2:]
    block = tile_size * tile_size
    s0 = range_start * block
    cap = (range_end - range_start) * block

    gauss_ids, in_tile = gather_tile_gaussians(
        isect_offsets.reshape(I, th, tw), flatten_ids, n_isects, s0 + cap,
    )
    gauss_ids = gauss_ids[:, s0:]
    in_tile = in_tile[:, s0:]

    means2d_f = means2d.reshape(I * N, 2)
    M_f = ray_transforms.reshape(I * N, 3, 3)
    opac_f = opacities.reshape(I * N)
    g_means = means2d_f[gauss_ids]  # [T, cap, 2]
    g_M = M_f[gauss_ids]  # [T, cap, 3, 3]
    g_opac = opac_f[gauss_ids]

    T_tiles = gauss_ids.shape[0]
    tiles_per_image = th * tw
    tids = jnp.arange(T_tiles, dtype=jnp.int32)
    t_in_img = tids % tiles_per_image
    img_of_tile = tids // tiles_per_image
    tx = (t_in_img % tw) * tile_size
    ty = (t_in_img // tw) * tile_size
    p = jnp.arange(block, dtype=jnp.int32)
    px = (tx[:, None] + p[None, :] % tile_size).astype(jnp.float32) + 0.5
    py = (ty[:, None] + p[None, :] // tile_size).astype(jnp.float32) + 0.5

    sigma = _sigma_2dgs(
        g_M[:, None], g_means[:, None], px[:, :, None], py[:, :, None]
    )  # [T, P, cap]
    alpha = jnp.minimum(ALPHA_CLAMP, g_opac[:, None, :] * jnp.exp(-sigma))
    live = ~((alpha < ALPHA_THRESHOLD) | ~in_tile[:, None, :])
    alpha = jnp.where(live, alpha, 0.0)

    trans = transmittances.reshape(I, image_height, image_width)
    pix_x = jnp.clip(px.astype(jnp.int32), 0, image_width - 1)
    pix_y = jnp.clip(py.astype(jnp.int32), 0, image_height - 1)
    T_in = trans[img_of_tile[:, None], pix_y, pix_x]
    P_raw = T_in[..., None] * jnp.cumprod(1.0 - alpha, axis=-1)
    included = (P_raw > TRANSMITTANCE_EPS) & live

    pix_id = (pix_y * image_width + pix_x).astype(jnp.int32)
    out_g = jnp.broadcast_to(gauss_ids[:, None, :], included.shape)
    out_p = jnp.broadcast_to(pix_id[..., None], included.shape)
    out_i = jnp.broadcast_to(
        img_of_tile[:, None, None], included.shape
    ).astype(jnp.int32)
    inside = (px < image_width)[:, :, None] & (py < image_height)[:, :, None]
    valid = included & inside
    return (
        (out_g % N).reshape(-1),
        out_p.reshape(-1),
        out_i.reshape(-1),
        valid.reshape(-1),
    )


def accumulate_2dgs(
    means2d: jnp.ndarray,  # [..., N, 2]
    ray_transforms: jnp.ndarray,  # [..., N, 3, 3]
    opacities: jnp.ndarray,  # [..., N]
    colors: jnp.ndarray,  # [..., N, D]
    gaussian_ids: jnp.ndarray,  # [M]
    pixel_ids: jnp.ndarray,  # [M]
    image_ids: jnp.ndarray,  # [M]
    image_width: int,
    image_height: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2DGS alpha compositing over explicit intersection lists (reference
    _torch_impl_2dgs.py:accumulate_2dgs:94)."""
    image_dims = means2d.shape[:-2]
    I = math.prod(image_dims) if image_dims else 1
    N = means2d.shape[-2]
    D = colors.shape[-1]

    flat_g = image_ids * N + gaussian_ids
    means2d_f = means2d.reshape(I * N, 2)[flat_g]
    M_f = ray_transforms.reshape(I * N, 3, 3)[flat_g]
    opac_f = opacities.reshape(I * N)[flat_g]
    colors_f = colors.reshape(I * N, D)[flat_g]

    px = (pixel_ids % image_width).astype(jnp.float32) + 0.5
    py = (pixel_ids // image_width).astype(jnp.float32) + 0.5
    sigma = _sigma_2dgs(M_f, means2d_f, px, py)
    alpha = jnp.minimum(ALPHA_CLAMP, opac_f * jnp.exp(-sigma))
    if valid is not None:
        alpha = jnp.where(valid, alpha, 0.0)
    return _composite_lists(
        alpha, colors_f, pixel_ids, image_ids, image_dims, I,
        image_width, image_height,
    )


def _composite_lists(alpha, colors_f, pixel_ids, image_ids, image_dims, I,
                     image_width, image_height):
    """Segment-sorted exclusive-prefix compositing shared by accumulate /
    accumulate_2dgs. Lists must be depth-ordered per pixel."""
    M = alpha.shape[0]
    D = colors_f.shape[-1]
    ray = (image_ids * image_height * image_width + pixel_ids).astype(jnp.int32)
    order = jnp.argsort(ray, stable=True)
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(M))
    a_sorted = alpha[order]
    r_sorted = ray[order]
    logs = jnp.log1p(-a_sorted)
    cum = jnp.cumsum(logs)
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), r_sorted[1:] != r_sorted[:-1]]
    )
    idxs = jnp.arange(M, dtype=jnp.int32)
    start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(seg_start, idxs, -1)
    )
    excl = cum - logs
    T_prev = jnp.exp(excl - excl[jnp.maximum(start_pos, 0)])
    weights = (a_sorted * T_prev)[inv]

    total_px = I * image_height * image_width
    renders = jnp.zeros((total_px, D)).at[ray].add(weights[:, None] * colors_f)
    alphas = jnp.zeros((total_px,)).at[ray].add(weights)
    return (
        renders.reshape(image_dims + (image_height, image_width, D)),
        alphas.reshape(image_dims + (image_height, image_width, 1)),
    )


def accumulate(
    means2d: jnp.ndarray,  # [..., N, 2]
    conics: jnp.ndarray,  # [..., N, 3]
    opacities: jnp.ndarray,  # [..., N]
    colors: jnp.ndarray,  # [..., N, D]
    gaussian_ids: jnp.ndarray,  # [M]
    pixel_ids: jnp.ndarray,  # [M]
    image_ids: jnp.ndarray,  # [M]
    image_width: int,
    image_height: int,
    valid: Optional[jnp.ndarray] = None,  # [M]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Alpha compositing over explicit (gaussian, pixel, image) lists —
    the reference's nerfacc-based ``accumulate`` (_torch_impl.py:506) in
    segment-sorted jnp form. Lists must be depth-ordered per pixel (as the
    index rasterizer emits them). Differentiable via autodiff."""
    image_dims = means2d.shape[:-2]
    I = math.prod(image_dims) if image_dims else 1
    N = means2d.shape[-2]
    D = colors.shape[-1]
    M = gaussian_ids.shape[0]

    flat_g = image_ids * N + gaussian_ids
    means2d_f = means2d.reshape(I * N, 2)[flat_g]
    conics_f = conics.reshape(I * N, 3)[flat_g]
    opac_f = opacities.reshape(I * N)[flat_g]
    colors_f = colors.reshape(I * N, D)[flat_g]

    px = (pixel_ids % image_width).astype(jnp.float32) + 0.5
    py = (pixel_ids // image_width).astype(jnp.float32) + 0.5
    dx = means2d_f[:, 0] - px
    dy = means2d_f[:, 1] - py
    sigma = 0.5 * (
        conics_f[:, 0] * dx * dx + conics_f[:, 2] * dy * dy
    ) + conics_f[:, 1] * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, opac_f * jnp.exp(-sigma))
    if valid is not None:
        alpha = jnp.where(valid, alpha, 0.0)
    return _composite_lists(
        alpha, colors_f, pixel_ids, image_ids, image_dims, I,
        image_width, image_height,
    )
