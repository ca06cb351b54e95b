import numpy as np
import jax.numpy as jnp
import pytest

from tdgs.ops.camera_models import (
    FThetaCameraDistortionParameters,
    RollingShutterType,
    distort_opencv_pinhole,
    interpolate_pose,
    project_point,
)
from tdgs.ops.projection import fully_fused_projection
from tdgs.ops.projection_ut import (
    UnscentedTransformParameters,
    fully_fused_projection_with_ut,
)
from tests.test_projection import make_scene


def test_ut_matches_ewa_for_undistorted_pinhole():
    """With no distortion and a global shutter, UT moments ≈ EWA
    linearization for small gaussians."""
    rng = np.random.default_rng(140)
    means, quats, scales, opacities, viewmats, Ks, w, h = make_scene(
        rng, N=64, C=2
    )
    scales = scales * 0.3  # small → linearization accurate
    r_ut, m_ut, d_ut, c_ut, _ = fully_fused_projection_with_ut(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), jnp.asarray(viewmats), jnp.asarray(Ks), w, h,
    )
    r_e, m_e, d_e, c_e, _ = fully_fused_projection(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), w, h,
        opacities=jnp.asarray(opacities),
    )
    both = (np.asarray(r_ut) > 0).all(-1) & (np.asarray(r_e) > 0).all(-1)
    assert both.sum() > 20
    np.testing.assert_allclose(
        np.asarray(m_ut)[both], np.asarray(m_e)[both], rtol=1e-2, atol=0.3
    )
    np.testing.assert_allclose(
        np.asarray(d_ut)[both], np.asarray(d_e)[both], rtol=1e-4
    )
    # conics close (radii within a pixel or two)
    np.testing.assert_allclose(
        np.asarray(r_ut)[both], np.asarray(r_e)[both], atol=2
    )


def test_distortion_changes_projection():
    rng = np.random.default_rng(141)
    means, quats, scales, opacities, viewmats, Ks, w, h = make_scene(
        rng, N=32, C=1
    )
    radial = jnp.asarray(np.tile([0.3, 0.0, 0, 0, 0, 0], (1, 1)).astype(np.float32))
    r0, m0, *_ = fully_fused_projection_with_ut(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), jnp.asarray(viewmats), jnp.asarray(Ks), w, h,
    )
    r1, m1, *_ = fully_fused_projection_with_ut(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), jnp.asarray(viewmats), jnp.asarray(Ks), w, h,
        radial_coeffs=radial,
    )
    both = (np.asarray(r0) > 0).all(-1) & (np.asarray(r1) > 0).all(-1)
    d = np.abs(np.asarray(m1)[both] - np.asarray(m0)[both])
    assert d.max() > 0.5  # barrel distortion moved points
    # center pixel barely moves, edges move more
    center_dist = np.linalg.norm(np.asarray(m0)[both] - [w / 2, h / 2], axis=-1)
    far = center_dist > np.median(center_dist)
    assert d[far].mean() > d[~far].mean()


def test_opencv_pinhole_distortion_formula():
    # pure radial k1: x' = x(1 + k1 r²)
    x = jnp.asarray([0.1, 0.5])
    y = jnp.asarray([0.0, -0.2])
    radial = jnp.asarray([[0.2, 0, 0, 0, 0, 0], [0.2, 0, 0, 0, 0, 0]])
    xd, yd = distort_opencv_pinhole(x, y, radial)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    np.testing.assert_allclose(np.asarray(xd), np.asarray(x) * (1 + 0.2 * r2),
                               rtol=1e-6)


def test_ftheta_projection():
    params = FThetaCameraDistortionParameters(
        angle_to_pixeldist_poly=(0.0, 100.0, 0.0, 0.0, 0.0, 0.0),
    )
    K = jnp.asarray([[1.0, 0, 320.0], [0, 1.0, 240.0], [0, 0, 1]])
    p = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 1.0]])
    px, valid = project_point(p, K, camera_model="ftheta", ftheta_coeffs=params)
    np.testing.assert_allclose(np.asarray(px)[0], [320, 240], atol=1e-4)
    # 45° off-axis → radius = 100 * pi/4
    np.testing.assert_allclose(
        np.asarray(px)[1], [320 + 100 * np.pi / 4, 240], rtol=1e-5
    )
    assert np.asarray(valid).all()


def test_rolling_shutter_shifts_moving_camera():
    rng = np.random.default_rng(142)
    means, quats, scales, opacities, viewmats, Ks, w, h = make_scene(
        rng, N=32, C=1
    )
    vm_end = viewmats.copy()
    vm_end[:, 0, 3] += 0.3  # camera translates during the frame
    r_g, m_g, *_ = fully_fused_projection_with_ut(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), jnp.asarray(viewmats), jnp.asarray(Ks), w, h,
    )
    r_rs, m_rs, *_ = fully_fused_projection_with_ut(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), jnp.asarray(viewmats), jnp.asarray(Ks), w, h,
        rolling_shutter=RollingShutterType.TOP_TO_BOTTOM,
        viewmats_rs=jnp.asarray(vm_end),
    )
    both = (np.asarray(r_g) > 0).all(-1) & (np.asarray(r_rs) > 0).all(-1)
    d = np.linalg.norm(np.asarray(m_rs)[both] - np.asarray(m_g)[both], axis=-1)
    # bottom-of-image gaussians shift more than top ones
    ys = np.asarray(m_g)[both][:, 1]
    top = ys < np.median(ys)
    assert d[~top].mean() > d[top].mean()


def test_pose_interpolation_endpoints():
    rng = np.random.default_rng(143)
    from tests.oracles import quat_to_rotmat_np

    v0 = np.eye(4, dtype=np.float32)
    v1 = np.eye(4, dtype=np.float32)
    v1[:3, :3] = quat_to_rotmat_np(rng.normal(size=4)).astype(np.float32)
    v1[:3, 3] = [1, 2, 3]
    p0 = interpolate_pose(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(0.0))
    p1 = interpolate_pose(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(p0), v0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), v1, atol=1e-5)
