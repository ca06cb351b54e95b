"""EWA projection of 3D Gaussians to screen space (pure jnp, dense layout).

Replaces the reference's fused projection CUDA kernels
(gsplat/cuda/csrc/ProjectionEWA3DGSFused.cu, ProjectionEWASimple.cu,
gsplat/cuda/include/Utils.cuh persp/ortho/fisheye_proj + add_blur).

TPU-first design notes:
- Always dense [..., C, N] outputs with a validity encoded as ``radii == 0``
  (the reference's packed/COO mode is intentionally dropped — XLA prefers
  dense masked compute; see SURVEY.md §7 design delta 1).
- The entire projection is elementwise per (camera, gaussian): one fused XLA
  computation on the VPU. No hand-written backward — differentiable through
  ``jax.grad`` (the reference's ~600-line backward kernel disappears).
- The opacity-aware radius bound (arXiv:2402.00525 §B.2) is kept: it is the
  main intersection-count reducer and directly controls our sort capacity.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from tdgs.ops.transforms import (
    covar_cam_sym6,
    pos_world_to_cam,
    quat_scale_to_covar_sym6,
)

# Minimum contribution for a gaussian to be composited; same constant as the
# reference (gsplat/cuda/include/Common.h: ALPHA_THRESHOLD = 1/255).
ALPHA_THRESHOLD = 1.0 / 255.0


def persp_proj(
    means: jnp.ndarray,  # [..., C, N, 3] (camera space)
    covars: jnp.ndarray,  # [..., C, N, 3, 3]
    Ks: jnp.ndarray,  # [..., C, 3, 3]
    width: int,
    height: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EWA perspective (pinhole) projection.

    Returns projected means2d [..., C, N, 2] and cov2d [..., C, N, 2, 2].
    The Jacobian is evaluated at frustum-clamped (tx, ty) with a 0.3·tan(fov)
    margin, as in the reference (Utils.cuh persp_proj).
    """
    means2d, (c00, c01, c11) = _persp_proj6(
        means, _cov33_to_sym6(covars), Ks, width, height
    )
    return means2d, _stack_cov2d(c00, c01, c11)


def _cov33_to_sym6(covars):
    return (covars[..., 0, 0], covars[..., 0, 1], covars[..., 0, 2],
            covars[..., 1, 1], covars[..., 1, 2], covars[..., 2, 2])


def _stack_cov2d(c00, c01, c11):
    row0 = jnp.stack([c00, c01], axis=-1)
    row1 = jnp.stack([c01, c11], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _persp_proj6(
    means: jnp.ndarray,  # [..., C, N, 3] (camera space)
    cov6,  # 6 arrays [..., C, N]
    Ks: jnp.ndarray,  # [..., C, 3, 3]
    width: int,
    height: int,
):
    """Component-form EWA perspective projection (SoA: everything stays
    elementwise — no [..., 2, 2] / [..., 3, 3] tensors materialize)."""
    tx, ty, tz = means[..., 0], means[..., 1], means[..., 2]
    tz = jnp.where(tz == 0.0, 1e-8, tz)
    tz2 = tz * tz

    fx = Ks[..., 0, 0, None]
    fy = Ks[..., 1, 1, None]
    cx = Ks[..., 0, 2, None]
    cy = Ks[..., 1, 2, None]
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy

    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy
    txc = tz * jnp.clip(tx / tz, -lim_x_neg, lim_x_pos)
    tyc = tz * jnp.clip(ty / tz, -lim_y_neg, lim_y_pos)

    # J = [[fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]]
    j00 = fx / tz
    j02 = -fx * txc / tz2
    j11 = fy / tz
    j12 = -fy * tyc / tz2

    zero = jnp.zeros_like(j00)
    cov2d6 = _jac_sandwich_2x3(cov6, j00, zero, j02, zero, j11, j12)
    means2d = jnp.stack(
        [fx * tx / tz + cx, fy * ty / tz + cy], axis=-1
    )
    return means2d, cov2d6


def ortho_proj(
    means: jnp.ndarray,
    covars: jnp.ndarray,
    Ks: jnp.ndarray,
    width: int,
    height: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Orthographic projection (Utils.cuh ortho_proj)."""
    means2d, (c00, c01, c11) = _ortho_proj6(
        means, _cov33_to_sym6(covars), Ks, width, height
    )
    return means2d, _stack_cov2d(c00, c01, c11)


def _ortho_proj6(means, cov6, Ks, width, height):
    fx = Ks[..., 0, 0, None]
    fy = Ks[..., 1, 1, None]
    cx = Ks[..., 0, 2, None]
    cy = Ks[..., 1, 2, None]
    zero = jnp.zeros_like(fx * means[..., 0])
    cov2d6 = _jac_sandwich_2x3(cov6, fx + zero, zero, zero, zero, fy + zero, zero)
    means2d = jnp.stack(
        [means[..., 0] * fx + cx, means[..., 1] * fy + cy], axis=-1
    )
    return means2d, cov2d6


def fisheye_proj(
    means: jnp.ndarray,
    covars: jnp.ndarray,
    Ks: jnp.ndarray,
    width: int,
    height: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Equidistant fisheye projection (Utils.cuh fisheye_proj)."""
    means2d, (c00, c01, c11) = _fisheye_proj6(
        means, _cov33_to_sym6(covars), Ks, width, height
    )
    return means2d, _stack_cov2d(c00, c01, c11)


def _fisheye_proj6(means, cov6, Ks, width, height):
    x, y, z = means[..., 0], means[..., 1], means[..., 2]
    fx = Ks[..., 0, 0, None]
    fy = Ks[..., 1, 1, None]
    cx = Ks[..., 0, 2, None]
    cy = Ks[..., 1, 2, None]

    eps = 1e-7
    xy_len = jnp.sqrt(x * x + y * y) + eps
    theta = jnp.arctan2(xy_len, z + eps)
    means2d = jnp.stack(
        [x * fx * theta / xy_len + cx, y * fy * theta / xy_len + cy], axis=-1
    )

    x2 = x * x + eps
    y2 = y * y
    xy = x * y
    x2y2 = x2 + y2
    x2y2z2_inv = 1.0 / (x2y2 + z * z)
    b = jnp.arctan2(xy_len, z) / xy_len / x2y2
    a = z * x2y2z2_inv / x2y2
    j00 = fx * (x2 * a + y2 * b)
    j01 = fx * xy * (a - b)
    j02 = -fx * x * x2y2z2_inv
    j10 = fy * xy * (a - b)
    j11 = fy * (y2 * a + x2 * b)
    j12 = -fy * y * x2y2z2_inv

    cov2d6 = _jac_sandwich_2x3(cov6, j00, j01, j02, j10, j11, j12)
    return means2d, cov2d6


def _jac_sandwich_2x3(cov6, j00, j01, j02, j10, j11, j12):
    """(c00, c01, c11) of J Σ Jᵀ for a per-element 2x3 Jacobian given by
    components, Σ given as its 6 upper-tri components.

    Expanded by hand instead of einsum over stacked J so XLA keeps everything
    as elementwise VPU ops with no materialized [.., 2, 3] tensors.
    """
    s00, s01, s02, s11, s12, s22 = cov6
    # rows of J·Σ
    a0 = j00 * s00 + j01 * s01 + j02 * s02
    a1 = j00 * s01 + j01 * s11 + j02 * s12
    a2 = j00 * s02 + j01 * s12 + j02 * s22
    b0 = j10 * s00 + j11 * s01 + j12 * s02
    b1 = j10 * s01 + j11 * s11 + j12 * s12
    b2 = j10 * s02 + j11 * s12 + j12 * s22
    c00 = a0 * j00 + a1 * j01 + a2 * j02
    c01 = a0 * j10 + a1 * j11 + a2 * j12
    c11 = b0 * j10 + b1 * j11 + b2 * j12
    return c00, c01, c11


def proj(
    means: jnp.ndarray,  # [..., C, N, 3] camera-space means
    covars: jnp.ndarray,  # [..., C, N, 3, 3] camera-space covariances
    Ks: jnp.ndarray,  # [..., C, 3, 3]
    width: int,
    height: int,
    camera_model: str = "pinhole",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unfused projection: camera-space gaussians → 2D. API parity with
    the reference's ``proj`` op (gsplat/cuda/_wrapper.py:250)."""
    if camera_model == "pinhole":
        return persp_proj(means, covars, Ks, width, height)
    if camera_model == "ortho":
        return ortho_proj(means, covars, Ks, width, height)
    if camera_model == "fisheye":
        return fisheye_proj(means, covars, Ks, width, height)
    raise ValueError(f"unsupported camera_model {camera_model!r}")


def add_blur(
    cov2d: jnp.ndarray,  # [..., 2, 2]
    eps2d: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Low-pass blur: add eps2d·I to the 2D covariance.

    Returns (blurred cov2d, det of blurred cov2d, antialiasing compensation
    = sqrt(det_orig / det_blur)). (reference: Utils.cuh add_blur)
    """
    det_orig = (
        cov2d[..., 0, 0] * cov2d[..., 1, 1] - cov2d[..., 0, 1] * cov2d[..., 1, 0]
    )
    blurred = cov2d + eps2d * jnp.eye(2, dtype=cov2d.dtype)
    det = (
        blurred[..., 0, 0] * blurred[..., 1, 1]
        - blurred[..., 0, 1] * blurred[..., 1, 0]
    )
    compensation = jnp.sqrt(jnp.maximum(det_orig / jnp.maximum(det, 1e-10), 0.0))
    return blurred, det, compensation


def fully_fused_projection(
    means: jnp.ndarray,  # [..., N, 3]
    quats: Optional[jnp.ndarray],  # [..., N, 4]
    scales: Optional[jnp.ndarray],  # [..., N, 3]
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
    opacities: Optional[jnp.ndarray] = None,  # [..., N]
    covars: Optional[jnp.ndarray] = None,  # [..., N, 3, 3] overrides quats/scales
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """World-space gaussians → screen: the reference's fused projection op.

    Returns (radii [..., C, N, 2] float32, means2d [..., C, N, 2],
    depths [..., C, N], conics [..., C, N, 3], compensations or None).
    Invalid gaussians have radii == 0 on both axes.

    Semantics match gsplat/cuda/csrc/ProjectionEWA3DGSFused.cu:16-211:
    culling on blurred det ≤ 0, depth outside (near, far), opacity below
    ALPHA_THRESHOLD, radius ≤ radius_clip (both axes), and image bounds;
    opacity-aware radius extend = min(3.33, sqrt(2·ln(op/αmin))) when
    opacities are provided, else fixed 3.33 (the torch-oracle behavior).
    """
    # The whole chain below is structure-of-arrays: covariances live as 6
    # scalar component arrays so every step is an elementwise VPU op that
    # XLA fuses into one kernel — the einsum form lowered tiny [3,3]
    # batched matmuls through a conv emitter with layout copies
    # (~10 ms/step at N=200k on v5e).
    if covars is None:
        cov6_w = quat_scale_to_covar_sym6(quats, scales)
    else:
        cov6_w = _cov33_to_sym6(covars)
    means_c = pos_world_to_cam(means, viewmats)
    cov6_c = covar_cam_sym6(cov6_w, viewmats)
    proj6 = {
        "pinhole": _persp_proj6,
        "ortho": _ortho_proj6,
        "fisheye": _fisheye_proj6,
    }.get(camera_model)
    if proj6 is None:
        raise ValueError(f"unsupported camera_model {camera_model!r}")
    means2d, (c00, c01, c11) = proj6(means_c, cov6_c, Ks, width, height)
    depths = means_c[..., 2]

    # Low-pass blur + antialiasing compensation (Utils.cuh add_blur),
    # component form.
    det_orig = c00 * c11 - c01 * c01
    c00b = c00 + eps2d
    c11b = c11 + eps2d
    det = c00b * c11b - c01 * c01
    compensation = jnp.sqrt(
        jnp.maximum(det_orig / jnp.maximum(det, 1e-10), 0.0)
    )

    # conic = inverse of blurred 2x2 covariance, upper-tri (a, b, c)
    det_safe = jnp.where(det == 0.0, 1.0, det)
    conics = jnp.stack(
        [c11b / det_safe, -c01 / det_safe, c00b / det_safe],
        axis=-1,
    )

    valid = (det > 0.0) & (depths > near_plane) & (depths < far_plane)

    extend = jnp.full_like(depths, 3.33)
    if opacities is not None:
        op = opacities[..., None, :] * jnp.ones_like(depths)
        if calc_compensations:
            op = op * compensation
        valid = valid & (op >= ALPHA_THRESHOLD)
        op_safe = jnp.maximum(op, ALPHA_THRESHOLD)
        extend = jnp.minimum(
            extend, jnp.sqrt(2.0 * jnp.log(op_safe / ALPHA_THRESHOLD))
        )

    radius_x = jnp.ceil(extend * jnp.sqrt(jnp.maximum(c00b, 0.0)))
    radius_y = jnp.ceil(extend * jnp.sqrt(jnp.maximum(c11b, 0.0)))

    valid = valid & ~((radius_x <= radius_clip) & (radius_y <= radius_clip))
    valid = valid & (
        (means2d[..., 0] + radius_x > 0)
        & (means2d[..., 0] - radius_x < width)
        & (means2d[..., 1] + radius_y > 0)
        & (means2d[..., 1] - radius_y < height)
    )

    radii = jnp.where(
        valid[..., None],
        jnp.stack([radius_x, radius_y], axis=-1),
        0.0,
    ).astype(jnp.int32)

    if calc_compensations:
        compensations = jnp.where(valid, compensation, 0.0)
    else:
        compensations = None
    return radii, means2d, depths, conics, compensations
