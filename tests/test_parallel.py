import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.parallel import make_mesh, rasterization_sharded
from tdgs.rendering import rasterization

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def make_scene(rng, N=64, C=8):
    means = rng.normal(size=(N, 3)).astype(np.float32) * 1.5 + [0, 0, 6.0]
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.4, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 1.0, size=(N,)).astype(np.float32)
    sh = rng.normal(size=(N, 4, 3)).astype(np.float32) * 0.3
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 0, 3] = np.linspace(-0.5, 0.5, C)
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    Ks = np.tile(K, (C, 1, 1))
    return means, quats, scales, opac, sh, viewmats, Ks


@pytest.mark.slow
def test_sharded_render_matches_single_device():
    rng = np.random.default_rng(60)
    means, quats, scales, opac, sh, viewmats, Ks = make_scene(rng)
    width, height = 64, 48
    mesh = make_mesh()

    img_s, alp_s, _ = rasterization_sharded(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
        jnp.asarray(Ks), width, height, mesh, sh_degree=1,
        tile_capacity=128, isect_capacity=1 << 14,
    )
    img_r, alp_r, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
        jnp.asarray(Ks), width, height, sh_degree=1,
        tile_capacity=128,
    )
    np.testing.assert_allclose(
        np.asarray(img_s), np.asarray(img_r), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(alp_s), np.asarray(alp_r), rtol=1e-4, atol=1e-4
    )


def test_sharded_render_grads_flow_to_gaussians():
    rng = np.random.default_rng(61)
    means, quats, scales, opac, sh, viewmats, Ks = make_scene(rng, N=32)
    width, height = 32, 32
    mesh = make_mesh()
    tgt = rng.uniform(0, 1, size=(8, height, width, 3)).astype(np.float32)

    def loss_sharded(means, opac):
        img, _, _ = rasterization_sharded(
            means, jnp.asarray(quats), jnp.asarray(scales), opac,
            jnp.asarray(sh), jnp.asarray(viewmats), jnp.asarray(Ks),
            width, height, mesh, sh_degree=1,
            tile_capacity=128, isect_capacity=1 << 13,
        )
        return jnp.mean((img - jnp.asarray(tgt)) ** 2)

    def loss_ref(means, opac):
        img, _, _ = rasterization(
            means, jnp.asarray(quats), jnp.asarray(scales), opac,
            jnp.asarray(sh), jnp.asarray(viewmats), jnp.asarray(Ks),
            width, height, sh_degree=1, tile_capacity=128,
        )
        return jnp.mean((img - jnp.asarray(tgt)) ** 2)

    g_s = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(
        jnp.asarray(means), jnp.asarray(opac)
    )
    g_r = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(means), jnp.asarray(opac))
    for gs, gr in zip(g_s, g_r):
        gs, gr = np.asarray(gs), np.asarray(gr)
        assert np.isfinite(gs).all()
        scale = np.abs(gr).max() + 1e-8
        assert np.abs(gs - gr).max() / scale < 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("rasterizer", ["packed", "packed_inference"])
def test_sharded_render_packed_matches_single_device(rasterizer):
    """The production packed rasterizers must work inside the shard_map
    exchange and match the single-device render."""
    rng = np.random.default_rng(61)
    means, quats, scales, opac, sh, viewmats, Ks = make_scene(rng)
    width, height = 64, 48
    mesh = make_mesh()

    img_s, alp_s, meta = rasterization_sharded(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
        jnp.asarray(Ks), width, height, mesh, sh_degree=1,
        tile_capacity=128, isect_capacity=1 << 13, rasterizer=rasterizer,
    )
    assert int(np.asarray(meta["n_dropped"]).sum()) == 0
    img_r, alp_r, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
        jnp.asarray(Ks), width, height, sh_degree=1,
        tile_capacity=128,
    )
    np.testing.assert_allclose(
        np.asarray(img_s), np.asarray(img_r), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(alp_s), np.asarray(alp_r), rtol=1e-3, atol=1e-3
    )


@pytest.mark.slow
def test_sharded_render_full_options_match_single_device():
    """antialiased + RGB+ED + backgrounds parity with rasterization()."""
    rng = np.random.default_rng(62)
    means, quats, scales, opac, sh, viewmats, Ks = make_scene(rng)
    width, height = 64, 48
    C = viewmats.shape[0]
    bkgd = rng.uniform(0, 1, size=(C, 3)).astype(np.float32)
    mesh = make_mesh()

    kw = dict(
        sh_degree=1, tile_capacity=128,
        render_mode="RGB+ED", rasterize_mode="antialiased",
        backgrounds=jnp.asarray(bkgd),
    )
    img_s, alp_s, _ = rasterization_sharded(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
        jnp.asarray(Ks), width, height, mesh, isect_capacity=1 << 14,
        rasterizer="packed", **kw,
    )
    img_r, alp_r, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
        jnp.asarray(Ks), width, height, **kw,
    )
    assert img_s.shape == img_r.shape == (C, height, width, 4)
    np.testing.assert_allclose(
        np.asarray(img_s), np.asarray(img_r), rtol=1e-3, atol=1e-3
    )


@pytest.mark.slow
def test_sharded_render_packed_grads_match_single_device():
    rng = np.random.default_rng(63)
    means, quats, scales, opac, sh, viewmats, Ks = make_scene(rng, N=32)
    width, height = 32, 32
    mesh = make_mesh()

    def loss_sharded(means_, opac_):
        img, alpha, _ = rasterization_sharded(
            means_, jnp.asarray(quats), jnp.asarray(scales), opac_,
            jnp.asarray(sh), jnp.asarray(viewmats), jnp.asarray(Ks),
            width, height, mesh, sh_degree=1, tile_capacity=128,
            isect_capacity=1 << 13, rasterizer="packed",
        )
        return jnp.sum(img**2) + jnp.sum(alpha)

    def loss_single(means_, opac_):
        img, alpha, _ = rasterization(
            means_, jnp.asarray(quats), jnp.asarray(scales), opac_,
            jnp.asarray(sh), jnp.asarray(viewmats), jnp.asarray(Ks),
            width, height, sh_degree=1, tile_capacity=128,
        )
        return jnp.sum(img**2) + jnp.sum(alpha)

    a = (jnp.asarray(means), jnp.asarray(opac))
    g_s = jax.grad(loss_sharded, argnums=(0, 1))(*a)
    g_r = jax.grad(loss_single, argnums=(0, 1))(*a)
    for name, gs, gr in zip(["means", "opac"], g_s, g_r):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), rtol=2e-3, atol=2e-3,
            err_msg=name,
        )
        assert np.abs(np.asarray(gs)).max() > 0


@pytest.mark.slow
@pytest.mark.parametrize("rasterizer", ["jax", "packed"])
def test_sharded_2dgs_matches_single_device(rasterizer):
    """2DGS surfel rendering through the sharded exchange must match the
    single-device rasterization_2dgs (same rasterizer family)."""
    from tdgs.parallel import rasterization_2dgs_sharded
    from tdgs.rendering import rasterization_2dgs

    mesh = make_mesh()
    D = mesh.shape["gauss"]
    rng = np.random.default_rng(23)
    N, C = 64 * D, D
    width, height = 64, 48
    means = rng.normal(size=(N, 3)).astype(np.float32) * [0.8, 0.6, 0.4]
    means[:, 2] += 4.0
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.15, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, size=(N,)).astype(np.float32)
    sh = (rng.normal(size=(N, 4, 3)) * 0.3).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 0, 3] = np.linspace(-0.2, 0.2, C)
    f = 60.0
    Ks = np.tile(
        np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32),
        (C, 1, 1),
    )

    j = jnp.asarray
    args = (j(means), j(quats), j(scales), j(opac), j(sh),
            j(viewmats), j(Ks))
    img_s, alp_s, nrm_s, dist_s, med_s, meta = rasterization_2dgs_sharded(
        *args, width, height, mesh, sh_degree=1, distloss=True,
        isect_capacity=1 << 13, tile_capacity=256, rasterizer=rasterizer,
    )
    assert int(np.asarray(meta["n_dropped"]).sum()) == 0
    # NB isect_capacity is PER DEVICE in the sharded path (1 camera each)
    # but global in the single-device call (all C cameras) — size it up
    out_r = rasterization_2dgs(
        *args, width, height, sh_degree=1, distloss=True,
        render_mode="RGB+ED", isect_capacity=(1 << 13) * D,
        tile_capacity=256, rasterizer=rasterizer,
    )
    img_r, alp_r, nrm_r, dist_r = out_r[0], out_r[1], out_r[2], out_r[4]

    np.testing.assert_allclose(
        np.asarray(img_s), np.asarray(img_r)[..., :3], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(alp_s), np.asarray(alp_r), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(nrm_s), np.asarray(nrm_r), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(dist_s), np.asarray(dist_r), rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
def test_sharded_2dgs_grads_flow_to_gaussians():
    from tdgs.parallel import rasterization_2dgs_sharded

    mesh = make_mesh()
    D = mesh.shape["gauss"]
    rng = np.random.default_rng(29)
    N, C = 32 * D, D
    width, height = 48, 32
    means = rng.normal(size=(N, 3)).astype(np.float32) * 0.5
    means[:, 2] += 3.0
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.15, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, size=(N,)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    f = 50.0
    Ks = np.tile(
        np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32),
        (C, 1, 1),
    )

    def loss(means_, quats_, scales_, opac_, cols_):
        img, alpha, nrm, dist, _, _ = rasterization_2dgs_sharded(
            means_, quats_, scales_, opac_, cols_,
            jnp.asarray(viewmats), jnp.asarray(Ks), width, height, mesh,
            distloss=True, isect_capacity=1 << 12, tile_capacity=128,
            rasterizer="packed",
        )
        return (jnp.sum(img ** 2) + jnp.sum(alpha ** 2)
                + jnp.sum(nrm ** 2) + jnp.sum(dist))

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(cols),
    )
    for name, x in zip(["means", "quats", "scales", "opac", "cols"], g):
        x = np.asarray(x)
        assert np.isfinite(x).all(), name
        assert np.abs(x).max() > 0, name


@pytest.mark.slow
def test_sharded_2dgs_absgrad_tap_matches_single_device():
    """2DGS AbsGS tap through the sharded exchange equals the single-device
    tap (round-3 carve-out lifted: 2DGS absgrad, sharded included)."""
    from tdgs.parallel import rasterization_2dgs_sharded
    from tdgs.rendering import rasterization_2dgs

    mesh = make_mesh()
    D = mesh.shape["gauss"]
    rng = np.random.default_rng(73)
    N, C = 32 * D, D
    width, height = 48, 32
    means = rng.normal(size=(N, 3)).astype(np.float32) * 0.5
    means[:, 2] += 3.0
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.15, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, size=(N,)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 0, 3] = np.linspace(-0.2, 0.2, C)
    f = 50.0
    Ks = np.tile(
        np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32),
        (C, 1, 1),
    )
    tgt = rng.uniform(0, 1, size=(C, height, width, 3)).astype(np.float32)
    j = jnp.asarray

    def loss_sharded(abs_tap):
        img, *_ = rasterization_2dgs_sharded(
            j(means), j(quats), j(scales), j(opac), j(cols),
            j(viewmats), j(Ks), width, height, mesh,
            isect_capacity=1 << 12, tile_capacity=128, rasterizer="packed",
            means2d_abs_tap=abs_tap,
        )
        return jnp.mean((img - j(tgt)) ** 2)

    def loss_single(abs_tap):
        out = rasterization_2dgs(
            j(means), j(quats), j(scales), j(opac), j(cols),
            j(viewmats), j(Ks), width, height,
            isect_capacity=(1 << 12) * D, tile_capacity=128,
            rasterizer="packed", means2d_abs_tap=abs_tap,
        )
        return jnp.mean((out[0] - j(tgt)) ** 2)

    abs_tap = jnp.zeros((C, N, 2))
    g_s = jax.jit(jax.grad(loss_sharded))(abs_tap)
    g_r = jax.grad(loss_single)(abs_tap)
    assert float(jnp.min(g_s)) >= 0.0
    assert float(jnp.abs(g_s).max()) > 0
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_r), rtol=2e-3, atol=2e-4
    )


@pytest.mark.slow
def test_sharded_eval3d_matches_single_device():
    """World-space (eval3d) rendering through the sharded exchange must
    match the single-device eval3d_packed path."""
    from tdgs.parallel import rasterization_eval3d_sharded

    mesh = make_mesh()
    D = mesh.shape["gauss"]
    rng = np.random.default_rng(31)
    N, C = 48 * D, D
    width, height = 64, 48
    means = rng.normal(size=(N, 3)).astype(np.float32) * [0.8, 0.6, 0.4]
    means[:, 2] += 4.0
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.03, 0.1, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, size=(N,)).astype(np.float32)
    sh = (rng.normal(size=(N, 4, 3)) * 0.3).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 0, 3] = np.linspace(-0.2, 0.2, C)
    f = 60.0
    Ks = np.tile(
        np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32),
        (C, 1, 1),
    )

    j = jnp.asarray
    args = (j(means), j(quats), j(scales), j(opac), j(sh),
            j(viewmats), j(Ks))
    img_s, alp_s, meta = rasterization_eval3d_sharded(
        *args, width, height, mesh, sh_degree=1,
        isect_capacity=1 << 13, tile_capacity=256,
    )
    assert int(np.asarray(meta["n_dropped"]).sum()) == 0
    # single-device: per-shard capacity covers 1 camera; globally C cameras
    img_r, alp_r, _ = rasterization(
        *args, width, height, sh_degree=1, rasterizer="eval3d_packed",
        isect_capacity=(1 << 13) * D, tile_capacity=256,
    )
    np.testing.assert_allclose(
        np.asarray(img_s), np.asarray(img_r), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(alp_s), np.asarray(alp_r), rtol=2e-3, atol=2e-3
    )

    # gradients flow to gaussians AND camera poses through the exchange
    def loss(means_, scales_, viewmats_):
        img, alpha, _ = rasterization_eval3d_sharded(
            means_, j(quats), scales_, j(opac), j(sh), viewmats_, j(Ks),
            width, height, mesh, sh_degree=1,
            isect_capacity=1 << 13, tile_capacity=256,
        )
        return jnp.sum(img ** 2) + jnp.sum(alpha ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        j(means), j(scales), j(viewmats)
    )
    for name, x in zip(["means", "scales", "viewmats"], g):
        x = np.asarray(x)
        assert np.isfinite(x).all(), name
        assert np.abs(x).max() > 0, name

    # RGB+ED: the depth channel rides the exchange like the single-device
    # path (carve-out lifted: depth in sharded eval3d training)
    img_sd, alp_sd, meta_sd = rasterization_eval3d_sharded(
        *args, width, height, mesh, sh_degree=1,
        isect_capacity=1 << 13, tile_capacity=256, render_mode="RGB+ED",
    )
    img_rd, alp_rd, _ = rasterization(
        *args, width, height, sh_degree=1, rasterizer="eval3d_packed",
        isect_capacity=(1 << 13) * D, tile_capacity=256,
        render_mode="RGB+ED",
    )
    assert img_sd.shape[-1] == 4
    assert meta_sd["means2d"].shape == (C, N, 2)
    np.testing.assert_allclose(
        np.asarray(img_sd), np.asarray(img_rd), rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
def test_replicated_render_matches_single_device():
    """Frame-parallel mode: gaussians replicated, cameras sharded — must
    reproduce the single-device rasterization exactly (same code path per
    device, zero collectives)."""
    from tdgs.parallel import rasterization_replicated

    rng = np.random.default_rng(62)
    means, quats, scales, opac, sh, viewmats, Ks = make_scene(rng)
    width, height = 64, 48
    mesh = make_mesh()

    img_p, alp_p, meta_p = rasterization_replicated(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
        jnp.asarray(Ks), width, height, mesh, sh_degree=1,
        tile_capacity=128, render_mode="RGB+ED",
    )
    img_r, alp_r, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
        jnp.asarray(Ks), width, height, sh_degree=1,
        tile_capacity=128, render_mode="RGB+ED",
    )
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_r), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(alp_p), np.asarray(alp_r), rtol=1e-4, atol=1e-4
    )
    assert meta_p["n_dropped"].shape == (jax.device_count(),)


@pytest.mark.slow
def test_sharded_2dgs_render_mode_ed_matches():
    """render_mode=RGB+ED through the sharded 2DGS exchange: the
    alpha-normalized expected-depth channel matches single-device."""
    from tdgs.parallel import rasterization_2dgs_sharded
    from tdgs.rendering import rasterization_2dgs

    mesh = make_mesh()
    D = mesh.shape["gauss"]
    rng = np.random.default_rng(24)
    N, C = 32 * D, D
    width, height = 48, 32
    means = rng.normal(size=(N, 3)).astype(np.float32) * 0.5
    means[:, 2] += 4.0
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.2, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.4, 0.9, size=(N,)).astype(np.float32)
    sh = (rng.normal(size=(N, 4, 3)) * 0.3).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 0, 3] = np.linspace(-0.2, 0.2, C)
    Ks = np.tile(
        np.array([[50.0, 0, width / 2], [0, 50.0, height / 2], [0, 0, 1]],
                 np.float32),
        (C, 1, 1),
    )
    j = jnp.asarray
    args = (j(means), j(quats), j(scales), j(opac), j(sh),
            j(viewmats), j(Ks))
    img_s, alp_s, *_ = rasterization_2dgs_sharded(
        *args, width, height, mesh, sh_degree=1, render_mode="RGB+ED",
        isect_capacity=1 << 13, tile_capacity=256,
    )
    out_r = rasterization_2dgs(
        *args, width, height, sh_degree=1, render_mode="RGB+ED",
        isect_capacity=(1 << 13) * D, tile_capacity=256,
    )
    assert img_s.shape[-1] == 4
    np.testing.assert_allclose(
        np.asarray(img_s), np.asarray(out_r[0]), rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
def test_sharded_2d_mesh_matches_single_device():
    """2-D (frame x gauss) mesh: cameras split over both axes, gaussians
    sharded on gauss and replicated over frame — the dp x tp composition.
    Must match the single-device render exactly."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()).reshape(2, -1)
    mesh2d = Mesh(devices, ("frame", "gauss"))

    rng = np.random.default_rng(63)
    means, quats, scales, opac, sh, viewmats, Ks = make_scene(rng, C=8)
    width, height = 64, 48

    j = jnp.asarray
    args = (j(means), j(quats), j(scales), j(opac), j(sh),
            j(viewmats), j(Ks))
    img_2d, alp_2d, meta = rasterization_sharded(
        *args, width, height, mesh2d, sh_degree=1,
        tile_capacity=128, isect_capacity=1 << 13,
        batch_axis="frame",
    )
    assert meta["radii"].shape[:2] == (8, means.shape[0])
    img_r, alp_r, _ = rasterization(
        *args, width, height, sh_degree=1, tile_capacity=128,
    )
    np.testing.assert_allclose(
        np.asarray(img_2d), np.asarray(img_r), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(alp_2d), np.asarray(alp_r), rtol=1e-4, atol=1e-4
    )


def test_sharded_2d_mesh_grads_and_tap():
    """Gradients flow through the 2-D layout: to gaussian params (through
    the column-local all_to_all) and to the densify tap (delivered
    [C, N, 2] with batch-major camera order)."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()).reshape(2, -1)
    mesh2d = Mesh(devices, ("frame", "gauss"))
    rng = np.random.default_rng(64)
    means, quats, scales, opac, sh, viewmats, Ks = make_scene(rng, N=32, C=8)
    width, height = 32, 32
    tgt = rng.uniform(0, 1, size=(8, height, width, 3)).astype(np.float32)
    j = jnp.asarray

    def loss(means_in, tap):
        img, _, _ = rasterization_sharded(
            means_in, jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
            jnp.asarray(Ks), width, height, mesh2d, sh_degree=1,
            tile_capacity=128, isect_capacity=1 << 12,
            batch_axis="frame", means2d_offset=tap,
        )
        return jnp.mean((img - tgt) ** 2)

    tap = jnp.zeros((8, 32, 2))
    g_means, g_tap = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        jnp.asarray(means), tap
    )
    assert float(jnp.abs(g_means).max()) > 0
    assert g_tap.shape == (8, 32, 2)
    assert float(jnp.abs(g_tap).max()) > 0


def test_sharded_absgrad_tap_matches_single_device():
    """The AbsGS |grad| tap through the sharded exchange must equal the
    single-device tap (carve-out lifted: trainer absgrad under sharded)."""
    rng = np.random.default_rng(71)
    means, quats, scales, opac, sh, viewmats, Ks = make_scene(rng, N=32)
    width, height = 32, 32
    C = viewmats.shape[0]
    N = means.shape[0]
    mesh = make_mesh()
    tgt = rng.uniform(0, 1, size=(C, height, width, 3)).astype(np.float32)

    def loss_sharded(means_, tap, abs_tap):
        img, _, _ = rasterization_sharded(
            means_, jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
            jnp.asarray(Ks), width, height, mesh, sh_degree=1,
            tile_capacity=128, isect_capacity=1 << 13, rasterizer="packed",
            means2d_offset=tap, means2d_abs_tap=abs_tap,
        )
        return jnp.mean((img - jnp.asarray(tgt)) ** 2)

    def loss_single(means_, tap, abs_tap):
        img, _, _ = rasterization(
            means_, jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmats),
            jnp.asarray(Ks), width, height, sh_degree=1,
            tile_capacity=128, rasterizer="packed",
            means2d_offset=tap, means2d_abs_tap=abs_tap,
        )
        return jnp.mean((img - jnp.asarray(tgt)) ** 2)

    tap = jnp.zeros((C, N, 2))
    abs_tap = jnp.zeros((C, N, 2))
    g_s = jax.jit(jax.grad(loss_sharded, argnums=(1, 2)))(
        jnp.asarray(means), tap, abs_tap
    )
    g_r = jax.grad(loss_single, argnums=(1, 2))(
        jnp.asarray(means), tap, abs_tap
    )
    # |grad| accumulations are non-negative and nonzero
    assert float(jnp.min(g_s[1])) >= 0.0
    assert float(jnp.abs(g_s[1]).max()) > 0
    for name, gs, gr in zip(["tap", "abs_tap"], g_s, g_r):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), rtol=2e-3, atol=2e-4,
            err_msg=name,
        )


@pytest.mark.slow
def test_sharded_per_camera_colors_matches_single_device():
    """Per-camera [C, N, D] colors (the appearance-MLP path) through the
    sharded exchange (carve-out lifted: trainer app_opt under sharded)."""
    rng = np.random.default_rng(72)
    means, quats, scales, opac, _, viewmats, Ks = make_scene(rng)
    width, height = 64, 48
    C, N = viewmats.shape[0], means.shape[0]
    colors = rng.uniform(0, 1, size=(C, N, 3)).astype(np.float32)
    mesh = make_mesh()

    j = jnp.asarray
    img_s, alp_s, _ = rasterization_sharded(
        j(means), j(quats), j(scales), j(opac), j(colors),
        j(viewmats), j(Ks), width, height, mesh, sh_degree=None,
        tile_capacity=128, isect_capacity=1 << 14, rasterizer="packed",
    )
    img_r, alp_r, _ = rasterization(
        j(means), j(quats), j(scales), j(opac), j(colors),
        j(viewmats), j(Ks), width, height, sh_degree=None,
        tile_capacity=128, rasterizer="packed",
    )
    np.testing.assert_allclose(
        np.asarray(img_s), np.asarray(img_r), rtol=2e-3, atol=2e-3
    )

    # gradients flow back to the per-camera colors, gaussian-sharded
    def loss(cols):
        img, _, _ = rasterization_sharded(
            j(means), j(quats), j(scales), j(opac), cols,
            j(viewmats), j(Ks), width, height, mesh, sh_degree=None,
            tile_capacity=128, isect_capacity=1 << 14, rasterizer="packed",
        )
        return jnp.sum(img ** 2)

    g = jax.grad(loss)(j(colors))
    assert g.shape == (C, N, 3)
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_sharded_meta_means2d_matches_single_device():
    """meta['means2d'] from the sharded render equals the single-device
    projection output and is differentiable (carve-out lifted:
    load_normals under sharded samples maps at these centers)."""
    rng = np.random.default_rng(73)
    means, quats, scales, opac, sh, viewmats, Ks = make_scene(rng)
    width, height = 64, 48
    mesh = make_mesh()
    j = jnp.asarray

    _, _, meta_s = rasterization_sharded(
        j(means), j(quats), j(scales), j(opac), j(sh), j(viewmats), j(Ks),
        width, height, mesh, sh_degree=1,
        tile_capacity=128, isect_capacity=1 << 14,
    )
    _, _, meta_r = rasterization(
        j(means), j(quats), j(scales), j(opac), j(sh), j(viewmats), j(Ks),
        width, height, sh_degree=1, tile_capacity=128,
    )
    assert meta_s["means2d"].shape == meta_r["means2d"].shape
    vis = np.asarray(meta_r["radii"] > 0).all(-1)
    np.testing.assert_allclose(
        np.asarray(meta_s["means2d"])[vis], np.asarray(meta_r["means2d"])[vis],
        rtol=1e-4, atol=1e-4,
    )

    def loss(means_):
        _, _, meta = rasterization_sharded(
            means_, j(quats), j(scales), j(opac), j(sh), j(viewmats), j(Ks),
            width, height, mesh, sh_degree=1,
            tile_capacity=128, isect_capacity=1 << 14,
        )
        radii = jax.lax.stop_gradient(meta["radii"])
        return jnp.sum(
            jnp.where((radii > 0).all(-1, keepdims=True), meta["means2d"], 0.0)
        )

    # jit like the trainer does: the eager shard_map transpose trips a
    # GSPMD sharding-override assert when the render outputs are dead
    g = jax.jit(jax.grad(loss))(j(means))
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_sharded_eval3d_fisheye_ut_matches_single_device():
    """Distorted-camera (fisheye + UT tiling) sharded eval3d matches the
    single-device eval3d_packed render (carve-out lifted: with_ut +
    non-pinhole camera models under sharded)."""
    from tdgs.parallel import rasterization_eval3d_sharded

    mesh = make_mesh()
    D = mesh.shape["gauss"]
    rng = np.random.default_rng(74)
    N, C = 48 * D, D
    width, height = 64, 48
    means = rng.normal(size=(N, 3)).astype(np.float32) * [0.8, 0.6, 0.4]
    means[:, 2] += 4.0
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.03, 0.1, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, size=(N,)).astype(np.float32)
    sh = (rng.normal(size=(N, 4, 3)) * 0.3).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    viewmats[:, 0, 3] = np.linspace(-0.2, 0.2, C)
    f = 60.0
    Ks = np.tile(
        np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32),
        (C, 1, 1),
    )
    radial = np.tile(
        np.array([0.05, -0.01, 0.002, 0.0], np.float32), (C, 1)
    )

    j = jnp.asarray
    args = (j(means), j(quats), j(scales), j(opac), j(sh),
            j(viewmats), j(Ks))
    img_s, alp_s, meta = rasterization_eval3d_sharded(
        *args, width, height, mesh, sh_degree=1,
        isect_capacity=1 << 13, tile_capacity=256,
        camera_model="fisheye", with_ut=True, radial_coeffs=j(radial),
    )
    assert int(np.asarray(meta["n_dropped"]).sum()) == 0
    img_r, alp_r, _ = rasterization(
        *args, width, height, sh_degree=1, rasterizer="eval3d_packed",
        isect_capacity=(1 << 13) * D, tile_capacity=256,
        camera_model="fisheye", with_ut=True, radial_coeffs=j(radial),
    )
    np.testing.assert_allclose(
        np.asarray(img_s), np.asarray(img_r), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(alp_s), np.asarray(alp_r), rtol=2e-3, atol=2e-3
    )

    # gradients flow to gaussians and poses under the distorted exchange
    def loss(means_, viewmats_):
        img, alpha, _ = rasterization_eval3d_sharded(
            means_, j(quats), j(scales), j(opac), j(sh), viewmats_, j(Ks),
            width, height, mesh, sh_degree=1,
            isect_capacity=1 << 13, tile_capacity=256,
            camera_model="fisheye", with_ut=True, radial_coeffs=j(radial),
        )
        return jnp.sum(img ** 2) + jnp.sum(alpha ** 2)

    g = jax.grad(loss, argnums=(0, 1))(j(means), j(viewmats))
    for name, x in zip(["means", "viewmats"], g):
        x = np.asarray(x)
        assert np.isfinite(x).all(), name
        assert np.abs(x).max() > 0, name
