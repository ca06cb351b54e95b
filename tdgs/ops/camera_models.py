"""Camera models with distortion + rolling shutter (pure jnp).

Counterpart of the reference's gsplat/cuda/include/Cameras.cuh (1341 LoC):
- OpenCV pinhole distortion: radial k1..k6 (rational), tangential p1 p2,
  thin-prism s1..s4 (Cameras.cuh OpenCVPinholeCameraModel)
- OpenCV fisheye (equidistant, k1..k4)
- FTheta camera (polynomial angle↔radius, forward + backward polynomials)
- rolling shutter timing: GLOBAL / TOP_TO_BOTTOM / LEFT_TO_RIGHT /
  BOTTOM_TO_TOP / RIGHT_TO_LEFT with pose interpolation between the frame
  start/end poses (Cameras.cuh RollingShutterParameters)

All are camera→pixel forward maps used by the UT projection
(tdgs.ops.projection_ut); differentiability comes from autodiff.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tdgs.ops.transforms import quat_normalize, quat_rotate, rotmat_to_quat


class RollingShutterType(enum.IntEnum):
    """(parity with gsplat/cuda/_wrapper.py:RollingShutterType)"""

    GLOBAL = 0
    TOP_TO_BOTTOM = 1
    LEFT_TO_RIGHT = 2
    BOTTOM_TO_TOP = 3
    RIGHT_TO_LEFT = 4


class FThetaPolynomialType(enum.IntEnum):
    PIXELDIST_TO_ANGLE = 0
    ANGLE_TO_PIXELDIST = 1


class FThetaCameraDistortionParameters(NamedTuple):
    """(parity with gsplat/cuda/_wrapper.py:FThetaCameraDistortionParameters)

    pixeldist_to_angle / angle_to_pixeldist: degree-5 polynomial coeffs.
    """

    reference_poly: int = int(FThetaPolynomialType.PIXELDIST_TO_ANGLE)
    pixeldist_to_angle_poly: Tuple[float, ...] = (0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    angle_to_pixeldist_poly: Tuple[float, ...] = (0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    max_angle: float = 3.14159 / 2


def _polyval(coeffs, x):
    out = jnp.zeros_like(x)
    for c in reversed(list(coeffs)):
        out = out * x + c
    return out


def distort_opencv_pinhole(
    x: jnp.ndarray,  # normalized camera coords x/z
    y: jnp.ndarray,
    radial: Optional[jnp.ndarray] = None,  # [..., 6] k1..k6 (rational model)
    tangential: Optional[jnp.ndarray] = None,  # [..., 2] p1 p2
    thin_prism: Optional[jnp.ndarray] = None,  # [..., 4] s1..s4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full OpenCV pinhole distortion (rational radial + tangential + thin
    prism), the model of Cameras.cuh OpenCVPinholeCameraModel."""
    r2 = x * x + y * y
    if radial is not None:
        k1, k2, k3, k4, k5, k6 = [radial[..., i] for i in range(6)]
        num = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        den = 1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
        scale = num / jnp.where(den == 0.0, 1.0, den)
    else:
        scale = jnp.ones_like(r2)
    xd = x * scale
    yd = y * scale
    if tangential is not None:
        p1, p2 = tangential[..., 0], tangential[..., 1]
        xd = xd + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = yd + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    if thin_prism is not None:
        s1, s2, s3, s4 = [thin_prism[..., i] for i in range(4)]
        xd = xd + r2 * (s1 + s2 * r2)
        yd = yd + r2 * (s3 + s4 * r2)
    return xd, yd


def distort_opencv_fisheye(
    x: jnp.ndarray,
    y: jnp.ndarray,
    coeffs: Optional[jnp.ndarray] = None,  # [..., 4] k1..k4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """OpenCV fisheye (equidistant) distortion."""
    r = jnp.sqrt(x * x + y * y)
    r_safe = jnp.where(r < 1e-9, 1.0, r)
    theta = jnp.arctan(r)
    if coeffs is not None:
        k1, k2, k3, k4 = [coeffs[..., i] for i in range(4)]
        t2 = theta * theta
        theta_d = theta * (
            1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
        )
    else:
        theta_d = theta
    scale = jnp.where(r < 1e-9, 1.0, theta_d / r_safe)
    return x * scale, y * scale


def project_point(
    p_cam: jnp.ndarray,  # [..., 3] camera-space points
    Ks: jnp.ndarray,  # [..., 3, 3]
    camera_model: str = "pinhole",
    radial_coeffs: Optional[jnp.ndarray] = None,
    tangential_coeffs: Optional[jnp.ndarray] = None,
    thin_prism_coeffs: Optional[jnp.ndarray] = None,
    ftheta_coeffs: Optional[FThetaCameraDistortionParameters] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full nonlinear camera-space → pixel projection. Returns
    (pixels [..., 2], valid [...])."""
    fx = Ks[..., 0, 0]
    fy = Ks[..., 1, 1]
    cx = Ks[..., 0, 2]
    cy = Ks[..., 1, 2]
    X, Y, Z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]

    if camera_model == "ftheta":
        params = ftheta_coeffs or FThetaCameraDistortionParameters()
        r3d = jnp.sqrt(X * X + Y * Y)
        theta = jnp.arctan2(r3d, Z)
        rd = _polyval(params.angle_to_pixeldist_poly, theta)
        r_safe = jnp.where(r3d < 1e-9, 1.0, r3d)
        u = X / r_safe * rd
        v = Y / r_safe * rd
        valid = theta <= params.max_angle
        return jnp.stack([u + cx, v + cy], axis=-1), valid

    Z_safe = jnp.where(jnp.abs(Z) < 1e-9, 1e-9, Z)
    x = X / Z_safe
    y = Y / Z_safe
    if camera_model == "pinhole":
        xd, yd = distort_opencv_pinhole(
            x, y, radial_coeffs, tangential_coeffs, thin_prism_coeffs
        )
        valid = Z > 0
    elif camera_model == "fisheye":
        xd, yd = distort_opencv_fisheye(x, y, radial_coeffs)
        valid = Z > 0
    elif camera_model == "ortho":
        xd, yd = X, Y
        valid = Z > 0
    else:
        raise ValueError(camera_model)
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1), valid


def _undistort_opencv_pinhole(xd, yd, radial, tangential, thin_prism,
                              iters: int = 8):
    """Invert distort_opencv_pinhole by fixed-point iteration (the classic
    cv2.undistortPoints scheme; Cameras.cuh image_point_to_camera_ray)."""
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        if radial is not None:
            k1, k2, k3, k4, k5, k6 = [radial[..., i] for i in range(6)]
            num = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
            den = 1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
            scale = num / jnp.where(den == 0.0, 1.0, den)
        else:
            scale = jnp.ones_like(r2)
        dx = jnp.zeros_like(x)
        dy = jnp.zeros_like(y)
        if tangential is not None:
            p1, p2 = tangential[..., 0], tangential[..., 1]
            dx = dx + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            dy = dy + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        if thin_prism is not None:
            s1, s2, s3, s4 = [thin_prism[..., i] for i in range(4)]
            dx = dx + r2 * (s1 + s2 * r2)
            dy = dy + r2 * (s3 + s4 * r2)
        scale = jnp.where(jnp.abs(scale) < 1e-9, 1e-9, scale)
        x = (xd - dx) / scale
        y = (yd - dy) / scale
    return x, y


def _invert_fisheye_theta(theta_d, coeffs, iters: int = 8):
    """Solve θ·(1 + k1θ² + k2θ⁴ + k3θ⁶ + k4θ⁸) = θ_d by Newton."""
    if coeffs is None:
        return theta_d
    k1, k2, k3, k4 = [coeffs[..., i] for i in range(4)]
    theta = theta_d
    for _ in range(iters):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        df = 1.0 + t2 * (
            3.0 * k1 + t2 * (5.0 * k2 + t2 * (7.0 * k3 + 9.0 * k4 * t2))
        )
        theta = theta - (f - theta_d) / jnp.where(jnp.abs(df) < 1e-9, 1.0, df)
    return theta


def unproject_pixel(
    pixels: jnp.ndarray,  # [..., 2] pixel centers
    Ks: jnp.ndarray,  # [..., 3, 3]
    camera_model: str = "pinhole",
    radial_coeffs: Optional[jnp.ndarray] = None,
    tangential_coeffs: Optional[jnp.ndarray] = None,
    thin_prism_coeffs: Optional[jnp.ndarray] = None,
    ftheta_coeffs: Optional[FThetaCameraDistortionParameters] = None,
) -> jnp.ndarray:
    """Pixel → unit camera-space ray direction (inverse of project_point;
    the reference's Cameras.cuh image_point_to_camera_ray family). Used by
    the eval3d world-space rasterizer. Returns [..., 3] unit vectors."""
    fx = Ks[..., 0, 0]
    fy = Ks[..., 1, 1]
    cx = Ks[..., 0, 2]
    cy = Ks[..., 1, 2]
    u = pixels[..., 0]
    v = pixels[..., 1]

    if camera_model == "ftheta":
        params = ftheta_coeffs or FThetaCameraDistortionParameters()
        du, dv = u - cx, v - cy
        rd = jnp.sqrt(du * du + dv * dv)
        theta = _polyval(params.pixeldist_to_angle_poly, rd)
        rd_safe = jnp.where(rd < 1e-9, 1.0, rd)
        s = jnp.sin(theta)
        d = jnp.stack(
            [du / rd_safe * s, dv / rd_safe * s, jnp.cos(theta)], axis=-1
        )
        # on-axis pixel: sin/rd → 0/0, direction is +z
        return jnp.where(rd[..., None] < 1e-9,
                         jnp.array([0.0, 0.0, 1.0], d.dtype), d)

    xd = (u - cx) / fx
    yd = (v - cy) / fy
    if camera_model == "pinhole":
        x, y = _undistort_opencv_pinhole(
            xd, yd, radial_coeffs, tangential_coeffs, thin_prism_coeffs
        )
    elif camera_model == "fisheye":
        theta_d = jnp.sqrt(xd * xd + yd * yd)
        theta = _invert_fisheye_theta(theta_d, radial_coeffs)
        r = jnp.tan(theta)
        td_safe = jnp.where(theta_d < 1e-9, 1.0, theta_d)
        x = xd / td_safe * r
        y = yd / td_safe * r
    else:
        raise ValueError(
            f"unproject_pixel: unsupported camera model {camera_model!r}"
        )
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return d * jax.lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True))


# ---------------------------------------------------------------------------
# Rolling shutter
# ---------------------------------------------------------------------------


def interpolate_pose(
    viewmats_start: jnp.ndarray,  # [..., 4, 4]
    viewmats_end: jnp.ndarray,  # [..., 4, 4]
    t: jnp.ndarray,  # [...] in [0, 1]
) -> jnp.ndarray:
    """SE(3) interpolation between frame-start and frame-end poses
    (quaternion nlerp + linear translation, Cameras.cuh pose interpolation)."""
    q0 = rotmat_to_quat(viewmats_start[..., :3, :3])
    q1 = rotmat_to_quat(viewmats_end[..., :3, :3])
    # shortest-path nlerp
    sign = jnp.where(jnp.sum(q0 * q1, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    q = quat_normalize(q0 * (1.0 - t[..., None]) + q1 * sign * t[..., None])
    t0 = viewmats_start[..., :3, 3]
    t1 = viewmats_end[..., :3, 3]
    trans = t0 * (1.0 - t[..., None]) + t1 * t[..., None]
    from tdgs.ops.transforms import quat_to_rotmat

    R = quat_to_rotmat(q)
    # batch shape comes from broadcasting poses against t
    batch = jnp.broadcast_shapes(R.shape[:-2], trans.shape[:-1])
    out = jnp.zeros(batch + (4, 4), viewmats_start.dtype)
    out = out.at[..., :3, :3].set(jnp.broadcast_to(R, batch + (3, 3)))
    out = out.at[..., :3, 3].set(jnp.broadcast_to(trans, batch + (3,)))
    out = out.at[..., 3, 3].set(1.0)
    return out


def shutter_time_from_pixel(
    pixels: jnp.ndarray,  # [..., 2]
    width: int,
    height: int,
    rs_type: RollingShutterType,
) -> jnp.ndarray:
    """Normalized shutter time of a pixel for each rolling-shutter mode."""
    u = jnp.clip(pixels[..., 0] / width, 0.0, 1.0)
    v = jnp.clip(pixels[..., 1] / height, 0.0, 1.0)
    if rs_type == RollingShutterType.GLOBAL:
        return jnp.zeros_like(u)
    if rs_type == RollingShutterType.TOP_TO_BOTTOM:
        return v
    if rs_type == RollingShutterType.LEFT_TO_RIGHT:
        return u
    if rs_type == RollingShutterType.BOTTOM_TO_TOP:
        return 1.0 - v
    if rs_type == RollingShutterType.RIGHT_TO_LEFT:
        return 1.0 - u
    raise ValueError(rs_type)
