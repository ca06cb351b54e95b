import numpy as np
import jax
import jax.numpy as jnp

from tdgs.training import normal_losses as NL
from tdgs.ops.transforms import quat_to_rotmat


def test_differentiable_normal_picks_smallest_axis():
    rng = np.random.default_rng(130)
    N = 32
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    # flat surfels: z-scale tiny
    scales = jnp.asarray(
        np.stack([np.full(N, 0.5), np.full(N, 0.4), np.full(N, 0.01)], -1)
        .astype(np.float32)
    )
    normals, conf = NL.calculate_gaussian_splat_normal_differentiable(
        quats, scales
    )
    R = np.asarray(quat_to_rotmat(quats))
    want = R[:, :, 2]  # third column = smallest-scale axis
    got = np.asarray(normals)
    # up to sign
    dots = np.abs(np.sum(got * want, axis=-1))
    assert (dots > 0.99).all()
    assert (np.asarray(conf) > 0.9).all()  # high anisotropy → confident

    # isotropic → low confidence
    _, conf_iso = NL.calculate_gaussian_splat_normal_differentiable(
        quats, jnp.ones((N, 3)) * 0.3
    )
    assert (np.asarray(conf_iso) < 0.1).all()


def test_normal_loss_variants():
    rng = np.random.default_rng(131)
    a = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    for t in ("cosine", "angular", "combined", "robust"):
        same = float(NL.compute_normal_loss(a, a, t))
        diff = float(NL.compute_normal_loss(a, -a, t))
        assert same < 0.01
        if t != "angular":  # angular uses |cos|: sign-invariant by design
            assert diff > same
    g = jax.grad(lambda x: NL.compute_normal_loss(x, a, "combined"))(a * 0.5)
    assert np.isfinite(np.asarray(g)).all()
    # progressive = 2x cosine
    p = float(NL.compute_progressive_normal_loss(a, -a))
    c = float(NL.compute_normal_loss(a, -a, "cosine"))
    np.testing.assert_allclose(p, 2 * c, rtol=1e-6)


def test_sample_normals_bilinear():
    H, W = 8, 8
    nmap = np.zeros((H, W, 3), np.float32)
    nmap[:, :4] = [1, 0, 0]
    nmap[:, 4:] = [0, 1, 0]
    # pixel centers at integer+0.5; x=4.0 is the boundary between columns 3/4
    pts = jnp.asarray([[2.5, 4.5], [6.5, 4.5], [4.0, 4.5]])
    out = np.asarray(NL.sample_normals_from_map(jnp.asarray(nmap), pts))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], [0.5, 0.5, 0], atol=1e-6)  # boundary blend


def test_smooth_normals_shape_and_smoothing():
    rng = np.random.default_rng(132)
    nmap = rng.normal(size=(16, 16, 3)).astype(np.float32)
    out = np.asarray(NL.smooth_normals(jnp.asarray(nmap), kernel_size=5))
    assert out.shape == (16, 16, 3)
    # variance reduced by smoothing
    assert out.var() < nmap.var()


def test_depth_smoothness_and_consistency():
    rng = np.random.default_rng(133)
    depth = jnp.asarray(rng.uniform(1, 2, (16, 16, 1)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    l = float(NL.depth_smoothness_loss(depth, img))
    assert np.isfinite(l) and l > 0
    flat = jnp.ones((16, 16, 1))
    assert float(NL.depth_smoothness_loss(flat, img)) < 1e-8

    n = jnp.asarray(rng.normal(size=(16, 16, 3)).astype(np.float32))
    assert float(NL.normal_consistency_loss(n, n)) < 1e-5
    assert float(NL.normal_consistency_loss(n, -n)) > 1.9


def test_render_normals_simple_places_colors():
    from tdgs.training.normal_losses import render_normals_simple

    normals = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0],
                           [0.0, 1.0, 0.0]])
    means2d = jnp.asarray([[2.0, 3.0], [5.0, 1.0], [-4.0, 2.0]])  # last OOB
    img = np.asarray(render_normals_simple(normals, means2d, 6, 8))
    assert img.shape == (6, 8, 3)
    np.testing.assert_allclose(img[3, 2], [0.5, 0.5, 1.0])
    np.testing.assert_allclose(img[1, 5], [1.0, 0.5, 0.5])
    np.testing.assert_allclose(img.sum(), 4.0, rtol=1e-6)  # OOB point contributed 0


def test_render_normals_with_interpolation_fills_holes():
    from tdgs.training.normal_losses import (
        render_normals_simple,
        render_normals_with_interpolation,
    )

    rng = np.random.default_rng(5)
    normals = jnp.asarray(
        rng.normal(size=(10, 3)).astype(np.float32)
    )
    means2d = jnp.asarray(
        rng.uniform(2, 14, size=(10, 2)).astype(np.float32)
    )
    simple = np.asarray(render_normals_simple(normals, means2d, 16, 16))
    smooth = np.asarray(
        render_normals_with_interpolation(normals, means2d, 16, 16)
    )
    assert smooth.shape == (16, 16, 3)
    # blur spreads coverage: more nonzero pixels than the point splat
    assert (smooth.sum(-1) > 0).sum() > (simple.sum(-1) > 0).sum()
    assert np.isfinite(smooth).all()


def test_surface_consistency_loss_prefers_coherent_normals():
    from tdgs.training.normal_losses import apply_surface_consistency_loss

    rng = np.random.default_rng(6)
    means = jnp.asarray(rng.uniform(0, 0.05, size=(32, 3)).astype(np.float32))
    coherent = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (32, 1))
    incoherent = jnp.asarray(
        rng.normal(size=(32, 3)).astype(np.float32)
    )
    lo = float(apply_surface_consistency_loss(coherent, means))
    hi = float(apply_surface_consistency_loss(incoherent, means))
    assert lo < 1e-5
    assert hi > lo


def test_spatial_smoothness_loss_zero_for_constant_normals():
    from tdgs.training.normal_losses import add_spatial_smoothness_loss

    rng = np.random.default_rng(7)
    n = 24
    m2 = jnp.asarray(rng.uniform(0, 32, size=(n, 2)).astype(np.float32))
    m3 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    const = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    mixed = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    assert float(add_spatial_smoothness_loss(const, m2, m3)) < 1e-6
    assert float(add_spatial_smoothness_loss(mixed, m2, m3)) > 1e-3
