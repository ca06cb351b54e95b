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
