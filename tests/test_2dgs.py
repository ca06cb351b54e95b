import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.ops.projection_2dgs import fully_fused_projection_2dgs
from tdgs.rendering import rasterization_2dgs
from tests import oracles


def make_surfel_scene(rng, N=64, C=2, width=64, height=48):
    means = rng.normal(size=(N, 3)).astype(np.float32)
    means[:, 2] += 5.0
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.5, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 1.0, size=(N,)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[1:, 0, 3] = 0.3
    K = np.array([[60.0, 0, width / 2], [0, 60.0, height / 2], [0, 0, 1]],
                 np.float32)
    Ks = np.tile(K, (C, 1, 1))
    return means, quats, scales, opac, colors, viewmats, Ks, width, height


def torch_oracle_projection(means, quats, scales, viewmats, Ks, width, height):
    """Cross-check against the reference formulas re-derived in numpy."""
    import numpy as np

    N = means.shape[0]
    C = viewmats.shape[0]
    R_cw = viewmats[:, :3, :3]
    t_cw = viewmats[:, :3, 3]
    means_c = np.einsum("cij,nj->cni", R_cw, means) + t_cw[:, None]
    R_wl = np.stack([oracles.quat_to_rotmat_np(q) for q in quats])
    RS_wl = R_wl * scales[:, None, :]
    RS_cl = np.einsum("cij,njk->cnik", R_cw, RS_wl)
    normals = RS_cl[..., 2]
    cos = -np.einsum("cni,cni->cn", normals, means_c)
    normals = normals * np.where(cos > 0, 1.0, -1.0)[..., None]
    T_cl = np.concatenate([RS_cl[..., :2], means_c[..., None]], axis=-1)
    T_sl = np.einsum("cij,cnjk->cnik", Ks, T_cl)
    M = np.swapaxes(T_sl, -1, -2)
    test = np.array([1.0, 1.0, -1.0])
    d = np.sum(M[..., 2] * M[..., 2] * test, axis=-1, keepdims=True)
    f = np.where(np.abs(d) > 0, test / d, 0.0)[..., None]
    means2d = np.sum(M[..., :2] * M[..., 2:3] * f, axis=-2)
    extents = np.sqrt(
        np.clip(means2d**2 - np.sum(M[..., :2] ** 2 * f, axis=-2), 1e-4, None)
    )
    return means2d, extents, normals, means_c[..., 2]


def test_projection_2dgs_matches_numpy_oracle():
    rng = np.random.default_rng(100)
    means, quats, scales, opac, colors, viewmats, Ks, w, h = make_surfel_scene(rng)
    radii, means2d, depths, M, normals = fully_fused_projection_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), w, h,
    )
    m2d_o, ext_o, nrm_o, dep_o = torch_oracle_projection(
        means.astype(np.float64), quats.astype(np.float64),
        scales.astype(np.float64), viewmats.astype(np.float64),
        Ks.astype(np.float64), w, h,
    )
    valid = (np.asarray(radii) > 0).all(-1)
    np.testing.assert_allclose(
        np.asarray(means2d)[valid], m2d_o[valid], rtol=1e-3, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(normals)[valid], nrm_o[valid], rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(depths)[valid], dep_o[valid], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(radii)[valid], np.ceil(3.33 * ext_o)[valid]
    )


def test_rasterization_2dgs_end_to_end():
    rng = np.random.default_rng(101)
    means, quats, scales, opac, colors, viewmats, Ks, w, h = make_surfel_scene(rng)
    out = rasterization_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks), w, h, render_mode="RGB+ED", distloss=True,
        tile_capacity=128, isect_capacity=1 << 14,
    )
    (img, alpha, normals, normals_from_depth, distort, median, meta) = out
    C = viewmats.shape[0]
    assert img.shape == (C, h, w, 4)  # RGB + ED
    assert alpha.shape == (C, h, w, 1)
    assert normals.shape == (C, h, w, 3)
    assert normals_from_depth.shape == (C, h, w, 3)
    assert distort.shape == (C, h, w, 1)
    assert median.shape == (C, h, w, 1)
    a = np.asarray(alpha)
    assert a.max() > 0.3 and np.isfinite(np.asarray(img)).all()
    # accumulated normals are nonzero where alpha is high (note: the
    # reference leaves surfel normals scale-weighted, magnitude ≈ s_z)
    n = np.asarray(normals)
    mask = a[..., 0] > 0.8
    norms = np.linalg.norm(n[mask], axis=-1)
    assert (norms > 1e-3).mean() > 0.9
    # median depth is positive where visible and near the splat depths
    med = np.asarray(median)[..., 0]
    assert med[mask].min() > 1.0
    assert np.isfinite(np.asarray(distort)).all()


def test_rasterization_2dgs_differentiable():
    rng = np.random.default_rng(102)
    means, quats, scales, opac, colors, viewmats, Ks, w, h = make_surfel_scene(
        rng, N=24, C=1, width=32, height=32
    )

    def loss(means_, scales_, opac_):
        img, alpha, normals, _, distort, _, _ = rasterization_2dgs(
            means_, jnp.asarray(quats), scales_, opac_, jnp.asarray(colors),
            jnp.asarray(viewmats), jnp.asarray(Ks), w, h,
            render_mode="RGB+ED", distloss=True,
            tile_capacity=128, isect_capacity=1 << 12,
        )
        return jnp.sum(img**2) + jnp.sum(normals**2) + jnp.sum(distort)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(opac)
    )
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
    assert np.abs(np.asarray(g[0])).max() > 0


def test_2dgs_packed_inference_matches_jax():
    """The streaming Pallas 2DGS fast path must match the jnp rasterizer
    (colors, alpha, and world-frame normals) through rasterization_2dgs."""
    from tdgs.rendering import rasterization_2dgs

    rng = np.random.default_rng(99)
    means, quats, scales, opac, colors, viewmats, Ks, width, height = (
        make_surfel_scene(rng, N=48, C=1)
    )
    args = (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks),
    )
    common = dict(
        width=width, height=height, tile_capacity=256,
        max_tiles_per_gauss=16, render_mode="RGB+ED",
    )
    out_j = rasterization_2dgs(*args, **common, rasterizer="jax")
    out_p = rasterization_2dgs(*args, **common,
                               rasterizer="packed_inference")
    for k, (a, b) in enumerate(zip(out_p[:3], out_j[:3])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
            err_msg=f"output {k}",
        )


def test_2dgs_packed_training_matches_jax():
    """The differentiable packed 2DGS path must match the jnp rasterizer on
    ALL outputs (colors, alpha, normals, distort, median) AND gradients."""
    rng = np.random.default_rng(7)
    means, quats, scales, opac, colors, viewmats, Ks, width, height = (
        make_surfel_scene(rng, N=48, C=1)
    )
    args = (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks),
    )
    common = dict(
        width=width, height=height, tile_capacity=256,
        max_tiles_per_gauss=16, render_mode="RGB+ED", distloss=True,
    )
    out_j = rasterization_2dgs(*args, **common, rasterizer="jax")
    out_p = rasterization_2dgs(*args, **common, rasterizer="packed")
    names = ["colors", "alpha", "normals", "normals_from_depth",
             "distort", "median"]
    for k, (a, b) in enumerate(zip(out_p[:6], out_j[:6])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
            err_msg=f"output {names[k]}",
        )

    def loss(means_, quats_, scales_, opac_, colors_, rasterizer):
        img, alpha, normals, nfd, distort, _, _ = rasterization_2dgs(
            means_, quats_, scales_, opac_, colors_,
            jnp.asarray(viewmats), jnp.asarray(Ks),
            rasterizer=rasterizer, **common,
        )
        return (
            jnp.sum(img**2) + jnp.sum(alpha**2) + jnp.sum(normals**2)
            + 3.0 * jnp.sum(distort)
        )

    diff_args = tuple(jnp.asarray(x) for x in
                      (means, quats, scales, opac, colors))
    g_j = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*diff_args, "jax")
    g_p = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*diff_args, "packed")
    for name, a, b in zip(["means", "quats", "scales", "opac", "colors"],
                          g_p, g_j):
        a, b = np.asarray(a), np.asarray(b)
        # tolerance relative to the gradient's scale: the two impls compute
        # sigma3d with different factorizations, so pixels sitting exactly
        # on the min(sigma3d, sigma2d) branch boundary may flip branches
        scale = np.abs(b).max()
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=2e-3, atol=1e-3,
            err_msg=f"grad {name}",
        )
        assert scale > 0, name


@pytest.mark.slow
def test_2dgs_packed_truncation_matches_jax():
    """Overflowing tiles (raw count > tile_capacity) exercise the 2DGS
    backward kernel's carry-invalidation + gap zero-fill protocol."""
    rng = np.random.default_rng(23)
    means, quats, scales, opac, colors, viewmats, Ks, width, height = (
        make_surfel_scene(rng, N=256, C=1, width=32, height=32)
    )
    scales = np.maximum(scales, 0.4)  # big surfels -> heavy tile overlap
    args = (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks),
    )
    common = dict(
        width=width, height=height, tile_capacity=128,  # one chunk
        max_tiles_per_gauss=16, render_mode="RGB+ED", distloss=True,
    )
    out_j = rasterization_2dgs(*args, **common, rasterizer="jax")
    out_p = rasterization_2dgs(*args, **common, rasterizer="packed")
    assert int(out_j[6]["n_isects"]) > 4 * 128, "scene must overflow tiles"
    for k, (a, b) in enumerate(zip(out_p[:5], out_j[:5])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"output {k}",
        )

    def loss(means_, quats_, scales_, opac_, colors_, rasterizer):
        img, alpha, normals, nfd, distort, _, _ = rasterization_2dgs(
            means_, quats_, scales_, opac_, colors_,
            jnp.asarray(viewmats), jnp.asarray(Ks),
            rasterizer=rasterizer, **common,
        )
        return (
            jnp.sum(img**2) + jnp.sum(alpha**2) + jnp.sum(normals**2)
            + 3.0 * jnp.sum(distort)
        )

    diff_args = tuple(jnp.asarray(x) for x in
                      (means, quats, scales, opac, colors))
    g_j = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*diff_args, "jax")
    g_p = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*diff_args, "packed")
    for name, a, b in zip(["means", "quats", "scales", "opac", "colors"],
                          g_p, g_j):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-8
        assert np.abs(a - b).max() / scale < 3e-2, (
            name, np.abs(a - b).max() / scale)


def test_2dgs_means2d_tap_gradient():
    """The 2DGS densification tap: grad of the loss w.r.t. a zeros
    means2d_offset equals the screen-space means2d gradient (same contract
    as the 3DGS path — DefaultStrategy densifies on it)."""
    import jax

    from tdgs.rendering import rasterization_2dgs

    rng = np.random.default_rng(40)
    N, C, width, height = 24, 2, 48, 32
    means = jnp.asarray(
        (rng.normal(size=(N, 3)) * 0.6 + [0, 0, 4.0]).astype(np.float32)
    )
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.1, 0.5, size=(N, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.4, 1.0, size=(N,)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 1, size=(N, 3)).astype(np.float32))
    viewmats = jnp.tile(jnp.eye(4), (C, 1, 1)).astype(jnp.float32)
    Ks = jnp.tile(
        jnp.asarray([[50.0, 0, 24], [0, 50.0, 16], [0, 0, 1]]), (C, 1, 1)
    ).astype(jnp.float32)

    def loss(tap):
        img, *_ = rasterization_2dgs(
            means, quats, scales, opac, cols, viewmats, Ks, width, height,
            means2d_offset=tap, tile_capacity=256, isect_capacity=1 << 12,
        )
        return jnp.sum(img**2)

    tap = jnp.zeros((C, N, 2))
    g = jax.grad(loss)(tap)
    assert g.shape == (C, N, 2)
    assert float(jnp.abs(g).max()) > 0.0, "tap delivered no gradient"
    # offsetting by the tap must equal offsetting means2d: finite-diff check
    eps = 1e-3
    d = jnp.zeros((C, N, 2)).at[0, 0, 0].set(eps)
    fd = (loss(d) - loss(-d)) / (2 * eps)
    np.testing.assert_allclose(float(fd), float(g[0, 0, 0]), rtol=2e-2,
                               atol=1e-3)
