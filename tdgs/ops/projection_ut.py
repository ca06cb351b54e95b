"""Unscented-Transform projection (3DGUT) — pure jnp.

Counterpart of gsplat/cuda/csrc/ProjectionUT3DGSFused.cu (+Cameras.cuh):
instead of linearizing the projection with the EWA Jacobian, 2n+1 = 7 sigma
points of each 3D gaussian are pushed through the FULL nonlinear camera
model (OpenCV pinhole/fisheye distortion, FTheta, rolling shutter with
iterated shutter-time pose interpolation) and the 2D moments are re-fit —
"3DGUT: Enabling Distorted Cameras and Secondary Rays in Gaussian
Splatting" (arXiv:2412.12507).

TPU note: the sigma-point dimension (7) folds into elementwise math over
[..., C, N, 7, ·] — pure VPU work, fully vmappable, no custom kernel needed.
The per-gaussian matrix sqrt uses the quat/scale factorization Σ^{1/2} = R·S
(exact, no Cholesky).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from tdgs.ops.camera_models import (
    FThetaCameraDistortionParameters,
    RollingShutterType,
    interpolate_pose,
    project_point,
    shutter_time_from_pixel,
)
from tdgs.ops.projection import ALPHA_THRESHOLD
from tdgs.ops.transforms import quat_to_rotmat


class UnscentedTransformParameters(NamedTuple):
    """(parity with gsplat/cuda/_wrapper.py:UnscentedTransformParameters)"""

    alpha: float = 1.0
    beta: float = 2.0
    kappa: float = 0.0
    in_image_margin_factor: float = 0.1
    require_all_sigma_points_valid: bool = False


def fully_fused_projection_with_ut(
    means: jnp.ndarray,  # [..., N, 3]
    quats: jnp.ndarray,  # [..., N, 4]
    scales: jnp.ndarray,  # [..., N, 3]
    opacities: Optional[jnp.ndarray],  # [..., N]
    viewmats: jnp.ndarray,  # [..., C, 4, 4]
    Ks: jnp.ndarray,  # [..., C, 3, 3]
    width: int,
    height: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    calc_compensations: bool = False,
    camera_model: str = "pinhole",
    ut_params: UnscentedTransformParameters = UnscentedTransformParameters(),
    radial_coeffs: Optional[jnp.ndarray] = None,
    tangential_coeffs: Optional[jnp.ndarray] = None,
    thin_prism_coeffs: Optional[jnp.ndarray] = None,
    ftheta_coeffs: Optional[FThetaCameraDistortionParameters] = None,
    rolling_shutter: RollingShutterType = RollingShutterType.GLOBAL,
    viewmats_rs: Optional[jnp.ndarray] = None,  # [..., C, 4, 4] frame-end
    rs_iterations: int = 2,
) -> Tuple[jnp.ndarray, ...]:
    """UT projection with distortion + rolling shutter.

    Returns (radii [..., C, N, 2] int32, means2d, depths, conics,
    compensations-or-None) — same contract as fully_fused_projection.
    """
    n_dim = 3
    a, b, k = ut_params.alpha, ut_params.beta, ut_params.kappa
    lam = a * a * (n_dim + k) - n_dim
    w_mean_0 = lam / (n_dim + lam)
    w_cov_0 = w_mean_0 + (1.0 - a * a + b)
    w_i = 1.0 / (2.0 * (n_dim + lam))

    # sigma points in world space: μ and μ ± sqrt(n+λ)·(R·S)ᵢ
    R = quat_to_rotmat(quats)  # [..., N, 3, 3]
    L = R * scales[..., None, :] * jnp.sqrt(n_dim + lam)  # Σ^{1/2} scaled
    deltas = jnp.concatenate(
        [
            jnp.zeros_like(means)[..., None, :],
            jnp.swapaxes(L, -1, -2),  # rows = scaled axes
            -jnp.swapaxes(L, -1, -2),
        ],
        axis=-2,
    )  # [..., N, 7, 3]
    sigma_pts = means[..., None, :] + deltas  # [..., N, 7, 3]

    # world → camera for every (camera, gaussian, sigma point)
    R_cw = viewmats[..., :3, :3]
    t_cw = viewmats[..., :3, 3]
    pts_cam = (
        jnp.einsum("...cij,...nsj->...cnsi", R_cw, sigma_pts, precision="highest")
        + t_cw[..., :, None, None, :]
    )  # [..., C, N, 7, 3]

    C = viewmats.shape[-3]
    Ks_b = Ks[..., :, None, None, :, :]  # broadcast over N, 7

    def proj_all(p_cam):
        return project_point(
            p_cam, Ks_b, camera_model=camera_model,
            radial_coeffs=None if radial_coeffs is None
            else radial_coeffs[..., :, None, None, :],
            tangential_coeffs=None if tangential_coeffs is None
            else tangential_coeffs[..., :, None, None, :],
            thin_prism_coeffs=None if thin_prism_coeffs is None
            else thin_prism_coeffs[..., :, None, None, :],
            ftheta_coeffs=ftheta_coeffs,
        )

    pixels, valid_pts = proj_all(pts_cam)  # [..., C, N, 7, 2]

    # rolling shutter: iterate pose-at-shutter-time and reproject
    if rolling_shutter != RollingShutterType.GLOBAL and viewmats_rs is not None:
        for _ in range(rs_iterations):
            t_shutter = shutter_time_from_pixel(
                pixels, width, height, rolling_shutter
            )  # [..., C, N, 7]
            vm_t = interpolate_pose(
                viewmats[..., :, None, None, :, :],
                viewmats_rs[..., :, None, None, :, :],
                t_shutter,
            )  # [..., C, N, 7, 4, 4]
            pts_cam = (
                jnp.einsum(
                    "...cnsij,...nsj->...cnsi",
                    vm_t[..., :3, :3],
                    sigma_pts,
                    precision="highest",
                )
                + vm_t[..., :3, 3]
            )
            pixels, valid_pts = proj_all(pts_cam)

    # UT moments
    w_mean = jnp.concatenate(
        [jnp.full((1,), w_mean_0), jnp.full((2 * n_dim,), w_i)]
    )
    w_cov = jnp.concatenate(
        [jnp.full((1,), w_cov_0), jnp.full((2 * n_dim,), w_i)]
    )
    mean2d = jnp.einsum("s,...sd->...d", w_mean, pixels)  # [..., C, N, 2]
    d = pixels - mean2d[..., None, :]
    cov2d = jnp.einsum("s,...sd,...se->...de", w_cov, d, d)

    depths = pts_cam[..., 0, 2]  # center sigma point depth

    from tdgs.ops.projection import add_blur

    cov2d_blur, det, compensation = add_blur(cov2d, eps2d)
    det_safe = jnp.where(det == 0.0, 1.0, det)
    conics = jnp.stack(
        [
            cov2d_blur[..., 1, 1] / det_safe,
            -cov2d_blur[..., 0, 1] / det_safe,
            cov2d_blur[..., 0, 0] / det_safe,
        ],
        axis=-1,
    )

    if ut_params.require_all_sigma_points_valid:
        pts_ok = valid_pts.all(axis=-1)
    else:
        pts_ok = valid_pts.any(axis=-1)
    valid = pts_ok & (det > 0) & (depths > near_plane) & (depths < far_plane)

    extend = jnp.full_like(depths, 3.33)
    if opacities is not None:
        op = opacities[..., None, :] * jnp.ones_like(depths)
        if calc_compensations:
            op = op * compensation
        valid = valid & (op >= ALPHA_THRESHOLD)
        extend = jnp.minimum(
            extend,
            jnp.sqrt(2.0 * jnp.log(jnp.maximum(op, ALPHA_THRESHOLD) / ALPHA_THRESHOLD)),
        )
    radius_x = jnp.ceil(extend * jnp.sqrt(jnp.maximum(cov2d_blur[..., 0, 0], 0.0)))
    radius_y = jnp.ceil(extend * jnp.sqrt(jnp.maximum(cov2d_blur[..., 1, 1], 0.0)))
    valid = valid & ~((radius_x <= radius_clip) & (radius_y <= radius_clip))
    margin_x = ut_params.in_image_margin_factor * width
    margin_y = ut_params.in_image_margin_factor * height
    valid = valid & (
        (mean2d[..., 0] + radius_x > -margin_x)
        & (mean2d[..., 0] - radius_x < width + margin_x)
        & (mean2d[..., 1] + radius_y > -margin_y)
        & (mean2d[..., 1] - radius_y < height + margin_y)
    )
    radii = jnp.where(
        valid[..., None], jnp.stack([radius_x, radius_y], axis=-1), 0.0
    ).astype(jnp.int32)
    compensations = jnp.where(valid, compensation, 0.0) if calc_compensations else None
    return radii, mean2d, depths, conics, compensations
