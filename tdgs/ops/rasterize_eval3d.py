"""World-space (eval3d) rasterizer: gaussian response along 3D pixel rays.

Counterpart of the reference's RasterizeToPixelsFromWorld3DGSFwd.cu /
...Bwd.cu (the 3DGUT secondary kernel, gsplat/rendering.py:668-759 eval3d
branch): instead of the EWA 2D conic approximation, each pixel evaluates
the TRUE maximal gaussian response along its (possibly distorted) camera
ray — exact for fisheye/FTheta cameras where the planar EWA approximation
degrades, and differentiable w.r.t. means/quats/scales directly (no
projection VJP chain).

Math (identical to the CUDA kernel's canonical-frame formulation): with
M = diag(1/s)·Rᵀ the world→canonical transform of a gaussian (μ, R, s),
a ray o + t·d has canonical offset g = M(o−μ) and direction r = M·d, and

    σ(t) = ½|g + t·r|²,   min over t:  σ* = ½(|g|² − (g·r)²/|r|²)
    at  t* = −(g·r)/|r|²   (kept only when t* > 0: in front of the camera)

α = min(0.999, op·exp(−σ*)) then front-to-back compositing — the same
prefix-product formulation (and thresholds) as tdgs.ops.rasterize_jax.
Per-pixel work stays in [T, P, cap]-shaped tensors: |g|² is
pixel-independent, g·r = d·(Mᵀg), and |r|² = d·Σ⁻¹·d via the 6 unique
entries of the precision matrix — no [T, P, cap, 3] intermediate.

Tile assignment and depth ordering reuse the UT projection's 2D
intersection lists (same as the reference: eval3d consumes isect_offsets
from fully_fused_projection_with_ut).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tdgs.ops.camera_models import (
    FThetaCameraDistortionParameters,
    RollingShutterType,
    shutter_time_from_pixel,
    unproject_pixel,
)
from tdgs.ops.projection import ALPHA_THRESHOLD
from tdgs.ops.rasterize_jax import (
    ALPHA_CLAMP,
    composite_prefix,
    gather_tile_gaussians,
)
from tdgs.ops.transforms import (
    quat_normalize,
    quat_rotate,
    quat_to_rotmat,
    rotmat_to_quat,
)


def rasterize_to_pixels_eval3d_jax(
    means: jnp.ndarray,  # [N, 3] world-space
    quats: jnp.ndarray,  # [N, 4] wxyz
    scales: jnp.ndarray,  # [N, 3]
    colors: jnp.ndarray,  # [I, N, D] (per-camera, SH already evaluated)
    opacities: jnp.ndarray,  # [I, N]
    viewmats: jnp.ndarray,  # [I, 4, 4] world→camera
    Ks: jnp.ndarray,  # [I, 3, 3]
    image_width: int,
    image_height: int,
    tile_size: int,
    isect_offsets: jnp.ndarray,  # [I, tile_height, tile_width]
    flatten_ids: jnp.ndarray,  # [capacity] → indices into I*N
    n_isects: jnp.ndarray,
    camera_model: str = "pinhole",
    radial_coeffs: Optional[jnp.ndarray] = None,  # [I, 6] or [I, 4]
    tangential_coeffs: Optional[jnp.ndarray] = None,  # [I, 2]
    thin_prism_coeffs: Optional[jnp.ndarray] = None,  # [I, 4]
    ftheta_coeffs: Optional[FThetaCameraDistortionParameters] = None,
    backgrounds: Optional[jnp.ndarray] = None,  # [I, D]
    tile_capacity: int = 1024,
    rolling_shutter: RollingShutterType = RollingShutterType.GLOBAL,
    viewmats_rs: Optional[jnp.ndarray] = None,  # [I, 4, 4] frame-end poses
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (render_colors [I, H, W, D], render_alphas [I, H, W, 1]).

    With ``rolling_shutter`` ≠ GLOBAL and ``viewmats_rs`` given, each
    pixel's ray uses the SE(3)-interpolated pose at its shutter time
    (Cameras.cuh RollingShutterParameters + the world-space kernel's
    per-pixel ray origins) — per-pixel origins keep every term in
    [T, P, cap] via quadratic-form expansions of the precision matrix.

    IMPORTANT: under rolling shutter the intersection lists must come from
    the RS-aware UT projection (rasterization(..., with_ut=True,
    rolling_shutter=..., viewmats_rs=...)); start-pose-only tiling leaves
    tile-boundary holes as the camera moves within the frame."""
    I = viewmats.shape[0]
    N = means.shape[0]
    D = colors.shape[-1]
    tile_height, tile_width = isect_offsets.shape[-2:]

    # Per-gaussian canonical transforms (camera-independent).
    R = quat_to_rotmat(quats)  # [N, 3, 3]
    inv_s = 1.0 / jnp.maximum(scales, 1e-8)
    M = inv_s[..., :, None] * jnp.swapaxes(R, -1, -2)  # diag(1/s)·Rᵀ [N,3,3]
    # precision Σ⁻¹ = MᵀM; keep its 6 unique entries for the d·Σ⁻¹·d form
    prec = jnp.einsum("nkj,nkl->njl", M, M, precision="highest")  # [N, 3, 3]
    prec6 = jnp.stack(
        [
            prec[:, 0, 0], prec[:, 1, 1], prec[:, 2, 2],
            2.0 * prec[:, 0, 1], 2.0 * prec[:, 0, 2], 2.0 * prec[:, 1, 2],
        ],
        axis=-1,
    )  # [N, 6]

    # Camera centers / rotations (world→cam: o = −Rᵀt, d_world = Rᵀ d_cam).
    R_wc = viewmats[:, :3, :3]
    t_wc = viewmats[:, :3, 3]
    use_rs = (
        viewmats_rs is not None
        and rolling_shutter != RollingShutterType.GLOBAL
    )

    gauss_ids, valid = gather_tile_gaussians(
        isect_offsets.reshape(I, tile_height, tile_width),
        flatten_ids, n_isects, tile_capacity,
    )  # [T, cap]
    T_total = gauss_ids.shape[0]
    tiles_per_image = tile_height * tile_width

    e_p6 = prec6[None].repeat(I, 0).reshape(I * N, 6)[gauss_ids]  # [T,cap,6]
    e_colors = colors.reshape(I * N, D)[gauss_ids]
    e_opac = opacities.reshape(I * N)[gauss_ids]

    # Per-tile pixel rays in world space: [T, P, 3].
    tile_ids = jnp.arange(T_total, dtype=jnp.int32)
    t_in_img = tile_ids % tiles_per_image
    img_of_tile = tile_ids // tiles_per_image
    tx = (t_in_img % tile_width) * tile_size
    ty = (t_in_img // tile_width) * tile_size
    p = jnp.arange(tile_size * tile_size, dtype=jnp.int32)
    px = (tx[:, None] + p[None, :] % tile_size).astype(jnp.float32) + 0.5
    py = (ty[:, None] + p[None, :] // tile_size).astype(jnp.float32) + 0.5
    pixels = jnp.stack([px, py], axis=-1)  # [T, P, 2]

    def per_cam(arr):
        return None if arr is None else arr[img_of_tile][:, None]

    d_cam = unproject_pixel(
        pixels, Ks[img_of_tile][:, None],
        camera_model=camera_model,
        radial_coeffs=per_cam(radial_coeffs),
        tangential_coeffs=per_cam(tangential_coeffs),
        thin_prism_coeffs=per_cam(thin_prism_coeffs),
        ftheta_coeffs=ftheta_coeffs,
    )  # [T, P, 3] unit, camera frame

    def sym6(a, b):
        """6-vector of the symmetric outer product ½(abᵀ + baᵀ) ordered to
        contract against prec6 (diag + doubled off-diag)."""
        return jnp.stack(
            [
                a[..., 0] * b[..., 0], a[..., 1] * b[..., 1],
                a[..., 2] * b[..., 2],
                0.5 * (a[..., 0] * b[..., 1] + a[..., 1] * b[..., 0]),
                0.5 * (a[..., 0] * b[..., 2] + a[..., 2] * b[..., 0]),
                0.5 * (a[..., 1] * b[..., 2] + a[..., 2] * b[..., 1]),
            ],
            axis=-1,
        )

    if not use_rs:
        # Global shutter: per-(camera, gaussian) terms are pixel-independent.
        origins = -jnp.einsum("ikj,ik->ij", R_wc, t_wc, precision="highest")
        delta = origins[:, None, :] - means[None, :, :]  # [I, N, 3]
        g = jnp.einsum("nkj,inj->ink", M, delta, precision="highest")
        gg = jnp.sum(g * g, axis=-1)  # [I, N]
        # u = Mᵀ g  (so g·r = d_world · u)
        u = jnp.einsum("nkj,ink->inj", M, g, precision="highest")
        e_gg = gg.reshape(I * N)[gauss_ids]  # [T, cap]
        e_u = u.reshape(I * N, 3)[gauss_ids]  # [T, cap, 3]
        d = jnp.einsum(
            "tkj,tpk->tpj", R_wc[img_of_tile], d_cam, precision="highest"
        )  # world frame
        gr = jnp.einsum("tpj,tej->tpe", d, e_u, precision="highest")
        gg_tpe = e_gg[:, None, :]
    else:
        # Rolling shutter: each pixel rides the SE(3)-interpolated pose at
        # its shutter time; expand |g|² and g·r as precision quadratic
        # forms so everything stays [T, P, {3, 6, cap}]-shaped.
        t_sh = shutter_time_from_pixel(
            pixels, image_width, image_height, rolling_shutter
        )  # [T, P]
        q0 = rotmat_to_quat(R_wc)  # [I, 4] world→cam
        q1 = rotmat_to_quat(viewmats_rs[:, :3, :3])
        sign = jnp.where(
            jnp.sum(q0 * q1, axis=-1, keepdims=True) < 0, -1.0, 1.0
        )
        q0t = q0[img_of_tile][:, None]  # [T, 1, 4]
        q1t = (q1 * sign)[img_of_tile][:, None]
        q = quat_normalize(
            q0t * (1.0 - t_sh[..., None]) + q1t * t_sh[..., None]
        )  # [T, P, 4]
        trans = (
            t_wc[img_of_tile][:, None] * (1.0 - t_sh[..., None])
            + viewmats_rs[:, :3, 3][img_of_tile][:, None] * t_sh[..., None]
        )  # [T, P, 3]
        q_inv = q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)
        o = -quat_rotate(q_inv, trans)  # [T, P, 3] camera center, world
        d = quat_rotate(q_inv, d_cam)  # [T, P, 3] ray, world

        mu = jnp.broadcast_to(means[None], (I, N, 3)).reshape(I * N, 3)[
            gauss_ids
        ]  # [T, cap, 3]
        # w = Σ⁻¹ μ (per entry, precomputed per gaussian) for cross terms
        w_n = jnp.einsum("njk,nk->nj", prec, means, precision="highest")
        w = jnp.broadcast_to(w_n[None], (I, N, 3)).reshape(I * N, 3)[
            gauss_ids
        ]  # [T, cap, 3]
        muAmu = jnp.sum(w * mu, axis=-1)  # [T, cap]
        oAo = jnp.einsum(
            "tpj,tej->tpe", sym6(o, o), e_p6, precision="highest"
        )
        oAmu = jnp.einsum("tpj,tej->tpe", o, w, precision="highest")
        oAd = jnp.einsum(
            "tpj,tej->tpe", sym6(o, d), e_p6, precision="highest"
        )
        muAd = jnp.einsum("tpj,tej->tpe", d, w, precision="highest")
        gg_tpe = oAo - 2.0 * oAmu + muAmu[:, None, :]
        gr = oAd - muAd  # (o − μ)ᵀ Σ⁻¹ d = g·r

    # σ* per (tile, pixel, entry)
    rr = jnp.einsum(
        "tpj,tej->tpe", sym6(d, d), e_p6, precision="highest"
    )
    rr = jnp.maximum(rr, 1e-12)
    sigma = 0.5 * (gg_tpe - gr * gr / rr)  # [T, P, cap]
    t_star = -gr / rr  # distance along the (unit) ray to the best response

    alpha = jnp.minimum(
        ALPHA_CLAMP, e_opac[:, None, :] * jnp.exp(-jnp.maximum(sigma, 0.0))
    )
    skip = (
        (t_star <= 0.0)  # best response behind the camera
        | (alpha < ALPHA_THRESHOLD)
        | ~valid[:, None, :]
    )
    alpha = jnp.where(skip, 0.0, alpha)

    rendered, T_out, _ = composite_prefix(alpha, e_colors[:, None, :, :])

    pad_h, pad_w = tile_height * tile_size, tile_width * tile_size
    img = rendered.reshape(I, tile_height, tile_width, tile_size, tile_size, D)
    img = img.transpose(0, 1, 3, 2, 4, 5).reshape(I, pad_h, pad_w, D)
    alp = 1.0 - T_out.reshape(I, tile_height, tile_width, tile_size, tile_size)
    alp = alp.transpose(0, 1, 3, 2, 4).reshape(I, pad_h, pad_w)
    img = img[:, :image_height, :image_width, :]
    alp = alp[:, :image_height, :image_width]

    if backgrounds is not None:
        img = img + (1.0 - alp[..., None]) * backgrounds.reshape(I, 1, 1, D)
    return img, alp[..., None]
