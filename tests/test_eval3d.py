"""World-space (eval3d) rasterizer + pixel unprojection tests
(reference RasterizeToPixelsFromWorld3DGS*.cu and Cameras.cuh ray gen)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.ops.camera_models import (
    FThetaCameraDistortionParameters,
    project_point,
    unproject_pixel,
)
from tdgs.rendering import rasterization


K = np.array([[[100.0, 0, 48], [0, 100.0, 32], [0, 0, 1]]], np.float32)


def random_cam_points(rng, n=200, max_tan=0.45):
    xy = rng.uniform(-max_tan, max_tan, size=(1, n, 2))
    z = rng.uniform(1.0, 8.0, size=(1, n, 1))
    return np.concatenate([xy * z, z], -1).astype(np.float32)


@pytest.mark.parametrize(
    "model,kwargs",
    [
        ("pinhole", {}),
        (
            "pinhole",
            {
                "radial_coeffs": np.array(
                    [[0.05, -0.01, 0.002, 0.01, 0.0, 0.0]], np.float32
                ),
                "tangential_coeffs": np.array([[0.004, -0.003]], np.float32),
                "thin_prism_coeffs": np.array(
                    [[0.001, 0.0, -0.002, 0.0]], np.float32
                ),
            },
        ),
        (
            "fisheye",
            {"radial_coeffs": np.array([[0.03, -0.01, 0.004, -0.001]],
                                       np.float32)},
        ),
        (
            "ftheta",
            {
                # series-inverse pair: θ = c1·rd + c3·rd³ ⇒
                # rd ≈ θ/c1 − (c3/c1⁴)·θ³ (error ≲ 0.1 px over this range)
                "ftheta_coeffs": FThetaCameraDistortionParameters(
                    pixeldist_to_angle_poly=(0.0, 0.01, 0.0, 1e-7, 0.0, 0.0),
                    angle_to_pixeldist_poly=(0.0, 100.0, 0.0, -10.0, 0.0,
                                             0.0),
                )
            },
        ),
    ],
)
def test_unproject_inverts_project(model, kwargs):
    """unproject(project(p)) must reproduce the direction of p."""
    rng = np.random.default_rng(210)
    p = random_cam_points(rng)
    if model == "ftheta":
        # the ftheta polys above are only an approximate inverse pair; the
        # round-trip uses project(unproject(pixel)) instead
        pix = rng.uniform([8, 8], [88, 56], size=(1, 64, 2)).astype(np.float32)
        d = unproject_pixel(jnp.asarray(pix), jnp.asarray(K)[:, None],
                            camera_model=model, **kwargs)
        pix2, valid = project_point(d, jnp.asarray(K)[:, None],
                                    camera_model=model, **kwargs)
        assert np.asarray(valid).all()
        np.testing.assert_allclose(np.asarray(pix2), pix, atol=0.2)
        return
    kw = {k: jnp.asarray(v)[:, None] if isinstance(v, np.ndarray) else v
          for k, v in kwargs.items()}
    pix, valid = project_point(jnp.asarray(p), jnp.asarray(K)[:, None],
                               camera_model=model, **kw)
    d = unproject_pixel(pix, jnp.asarray(K)[:, None], camera_model=model,
                        **kw)
    d_ref = p / np.linalg.norm(p, axis=-1, keepdims=True)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=2e-4)


def make_scene(rng, N=48, spread=0.8, scale_rng=(-3.2, -2.2)):
    means = (rng.normal(size=(N, 3)) * spread + [0, 0, 5.0]).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(*scale_rng, size=(N, 3))).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, size=(N,)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    viewmats = np.eye(4, dtype=np.float32)[None]
    return means, quats, scales, opac, colors, viewmats


def test_eval3d_matches_ewa_for_small_gaussians():
    """For small gaussians under an undistorted pinhole camera the EWA
    planar approximation is accurate — the two rasterizers must agree."""
    rng = np.random.default_rng(211)
    means, quats, scales, opac, colors, viewmats = make_scene(rng)
    width, height = 96, 64
    common = dict(tile_capacity=256, max_tiles_per_gauss=16, eps2d=0.0)
    img3d, alp3d, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(K), width, height, rasterizer="eval3d", **common,
    )
    img2d, alp2d, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(K), width, height, rasterizer="jax", **common,
    )
    # the models differ by O(scale²/depth²) — compare loosely but globally
    diff = np.abs(np.asarray(img3d) - np.asarray(img2d))
    assert np.asarray(alp2d).max() > 0.3  # scene actually covers pixels
    assert diff.mean() < 5e-3, diff.mean()
    assert diff.max() < 0.12, diff.max()


def test_eval3d_analytic_single_gaussian():
    """One isotropic gaussian: α(pixel) = op·exp(−d⊥²/(2s²)) with d⊥ the
    ray-to-center perpendicular distance — checked in numpy."""
    s = 0.25
    means = np.array([[0.3, -0.2, 5.0]], np.float32)
    quats = np.array([[1.0, 0, 0, 0]], np.float32)
    scales = np.full((1, 3), s, np.float32)
    opac = np.array([0.7], np.float32)
    colors = np.array([[1.0, 1.0, 1.0]], np.float32)
    viewmats = np.eye(4, dtype=np.float32)[None]
    width, height = 96, 64
    _, alpha, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(K), width, height, rasterizer="eval3d",
        tile_capacity=64, max_tiles_per_gauss=64, eps2d=0.0,
    )
    alpha = np.asarray(alpha)[0, ..., 0]
    ys, xs = np.mgrid[0:height, 0:width]
    d = np.stack(
        [(xs + 0.5 - K[0, 0, 2]) / K[0, 0, 0],
         (ys + 0.5 - K[0, 1, 2]) / K[0, 1, 1],
         np.ones_like(xs, np.float32)], -1,
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    mu = means[0]
    t = d @ mu
    perp2 = (mu * mu).sum() - t * t
    a_ref = 0.7 * np.exp(-perp2 / (2 * s * s))
    a_ref = np.where(a_ref < 1.0 / 255.0, 0.0, a_ref)
    np.testing.assert_allclose(alpha, a_ref, atol=2e-3)


def test_eval3d_differentiable_wrt_3d_params():
    rng = np.random.default_rng(212)
    means, quats, scales, opac, colors, viewmats = make_scene(rng, N=16)
    tgt = jnp.asarray(rng.uniform(size=(1, 32, 48, 3)), jnp.float32)

    def loss(means, quats, scales):
        img, _, _ = rasterization(
            means, quats, scales, jnp.asarray(opac), jnp.asarray(colors),
            jnp.asarray(viewmats), jnp.asarray(K), 48, 32,
            rasterizer="eval3d", tile_capacity=128, max_tiles_per_gauss=16,
        )
        return jnp.sum((img - tgt) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales)
    )
    for gi in g:
        arr = np.asarray(gi)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() > 0


def test_eval3d_fisheye_with_ut():
    """Distorted fisheye + UT projection + world-space raster — the 3DGUT
    configuration the 2D EWA path can't represent."""
    rng = np.random.default_rng(213)
    means, quats, scales, opac, colors, viewmats = make_scene(rng, N=32)
    radial = np.array([[0.05, -0.02, 0.0, 0.0]], np.float32)
    img, alpha, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(K), 96, 64, rasterizer="eval3d", with_ut=True,
        camera_model="fisheye", radial_coeffs=jnp.asarray(radial),
        tile_capacity=128, max_tiles_per_gauss=16,
    )
    assert np.isfinite(np.asarray(img)).all()
    assert np.asarray(alpha).max() > 0.2


@pytest.mark.slow
def test_eval3d_rolling_shutter_identity():
    """RS with end pose == start pose must equal the global-shutter render
    exactly (pose interpolation degenerates to the constant pose)."""
    from tdgs.ops.camera_models import RollingShutterType

    rng = np.random.default_rng(214)
    means, quats, scales, opac, colors, viewmats = make_scene(rng, N=24)
    common = dict(
        rasterizer="eval3d", tile_capacity=128, max_tiles_per_gauss=16,
    )
    img_g, _, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(K), 96, 64, **common,
    )
    img_rs, _, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(K), 96, 64,
        rolling_shutter=RollingShutterType.TOP_TO_BOTTOM,
        viewmats_rs=jnp.asarray(viewmats), **common,
    )
    # the RS path evaluates |g|² via the expanded quadratic form
    # (oᵀAo − 2oᵀAμ + μᵀAμ) — equal math, f32 cancellation ~1e-3
    np.testing.assert_allclose(
        np.asarray(img_rs), np.asarray(img_g), atol=2e-3
    )


def test_eval3d_rolling_shutter_blends_poses():
    """TOP_TO_BOTTOM with a translated end pose: the first row matches the
    start-pose global render, the last row matches the end-pose one."""
    from tdgs.ops.camera_models import RollingShutterType

    rng = np.random.default_rng(215)
    means, quats, scales, opac, colors, viewmats = make_scene(rng, N=24)
    vm_end = viewmats.copy()
    vm_end[0, 0, 3] += 0.4  # shift camera along x at frame end
    args = (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors),
    )
    common = dict(
        rasterizer="eval3d", tile_capacity=128, max_tiles_per_gauss=32,
    )
    h = 64
    img_start, _, _ = rasterization(
        *args, jnp.asarray(viewmats), jnp.asarray(K), 96, h, **common)
    img_end, _, _ = rasterization(
        *args, jnp.asarray(vm_end), jnp.asarray(K), 96, h, **common)
    img_rs, _, _ = rasterization(
        *args, jnp.asarray(viewmats), jnp.asarray(K), 96, h,
        rolling_shutter=RollingShutterType.TOP_TO_BOTTOM,
        viewmats_rs=jnp.asarray(vm_end), **common)
    a = np.asarray(img_rs)
    s = np.asarray(img_start)
    e = np.asarray(img_end)
    # row 0: t = 0.5/H ≈ 0 → start pose; last row: t ≈ 1 → end pose
    assert np.abs(a[0, 0] - s[0, 0]).max() < 2e-2
    assert np.abs(a[0, -1] - e[0, -1]).max() < 2e-2
    # and the RS frame genuinely differs from both single-pose renders
    assert np.abs(a - s).mean() > 1e-3 and np.abs(a - e).mean() > 1e-3


@pytest.mark.parametrize("case", [
    "pinhole",
    # non-pinhole camera models ride the same kernel; grads/identity
    # tests below cover their math — slow tier re-checks them
    pytest.param("fisheye_ut", marks=pytest.mark.slow),
    pytest.param("rolling_shutter", marks=pytest.mark.slow),
])
def test_eval3d_packed_kernel_parity(case):
    """The streaming Pallas eval3d kernel (interpret mode on CPU) must match
    the differentiable jnp path on the same sorted entries."""
    from tdgs.ops.camera_models import RollingShutterType

    rng = np.random.default_rng(216)
    means, quats, scales, opac, colors, viewmats = make_scene(rng, N=40)
    width, height = 96, 64
    common = dict(tile_capacity=256, max_tiles_per_gauss=16, eps2d=0.0)
    kwargs = {}
    if case == "fisheye_ut":
        kwargs = dict(
            with_ut=True, camera_model="fisheye",
            radial_coeffs=jnp.asarray(
                np.array([[0.05, -0.02, 0.0, 0.0]], np.float32)
            ),
        )
    elif case == "rolling_shutter":
        vm_end = viewmats.copy()
        vm_end[0, 0, 3] += 0.3
        kwargs = dict(
            with_ut=True,
            rolling_shutter=RollingShutterType.TOP_TO_BOTTOM,
            viewmats_rs=jnp.asarray(vm_end),
        )
    args = (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(K), width, height,
    )
    img_ref, alp_ref, _ = rasterization(
        *args, rasterizer="eval3d", **common, **kwargs,
    )
    img_k, alp_k, meta = rasterization(
        *args, rasterizer="eval3d_packed", **common, **kwargs,
    )
    assert int(meta["n_dropped"]) == 0
    assert np.asarray(alp_ref).max() > 0.2  # scene covers pixels
    # same math, different entry order (packed keys quantize depth) and
    # different reduction order → small f32 differences
    np.testing.assert_allclose(
        np.asarray(img_k), np.asarray(img_ref), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(alp_k), np.asarray(alp_ref), atol=5e-3
    )


@pytest.mark.parametrize("case", [
    "pinhole",
    pytest.param("rolling_shutter", marks=pytest.mark.slow),
])
def test_eval3d_packed_grads_match_jax(case):
    """The packed eval3d custom VJP must match autodiff through the jnp
    path — gradients to splat params AND camera poses (pose-opt)."""
    from tdgs.ops.camera_models import RollingShutterType

    rng = np.random.default_rng(217)
    means, quats, scales, opac, colors, viewmats = make_scene(rng, N=32)
    width, height = 64, 48
    common = dict(tile_capacity=256, max_tiles_per_gauss=16, eps2d=0.0)
    kwargs = {}
    if case == "rolling_shutter":
        vm_end = viewmats.copy()
        vm_end[0, 0, 3] += 0.2
        kwargs = dict(
            with_ut=True,
            rolling_shutter=RollingShutterType.TOP_TO_BOTTOM,
            viewmats_rs=jnp.asarray(vm_end),
        )

    def loss(means_, quats_, scales_, opac_, colors_, vm_, rasterizer):
        img, alpha, _ = rasterization(
            means_, quats_, scales_, opac_, colors_, vm_, jnp.asarray(K),
            width, height, rasterizer=rasterizer, **common, **kwargs,
        )
        return jnp.sum(img**2) + 0.3 * jnp.sum(alpha**2)

    args = (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
    )
    g_j = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*args, "eval3d")
    g_p = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*args, "eval3d_packed")
    names = ["means", "quats", "scales", "opac", "colors", "viewmats"]
    for name, a, b in zip(names, g_p, g_j):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-8
        assert scale > 1e-6 or name == "viewmats", name  # grads are alive
        assert np.abs(a - b).max() / scale < 3e-2, (
            name, np.abs(a - b).max() / scale)
