"""AbsGS absolute screen-gradient accumulation (the reference's
``absgrad``: RasterizeToPixels3DGSBwd.cu v_means2d_abs + DefaultStrategy
absgrad flag). Here |·| is taken per (gaussian, tile) entry — for gaussians
confined to a single tile the result must exactly equal |signed grad|, and
in general it dominates it."""

import numpy as np
import jax
import jax.numpy as jnp

from tdgs.ops import tiling
from tdgs.ops.rasterize_jax import rasterize_to_pixels_jax
from tdgs.rendering import rasterization


def make_single_tile_scene(rng, tile_size=16, tw=3, th=2, per_tile=3):
    """Gaussians fully inside one tile each (radius << margin)."""
    width, height = tw * tile_size, th * tile_size
    N = tw * th * per_tile
    centers = []
    for t in range(tw * th):
        cx = (t % tw) * tile_size + tile_size / 2
        cy = (t // tw) * tile_size + tile_size / 2
        jitter = rng.uniform(-2, 2, size=(per_tile, 2))
        centers.append(np.array([cx, cy]) + jitter)
    means2d = np.concatenate(centers).astype(np.float32)[None]  # [1, N, 2]
    conics = np.tile(
        np.array([1.5, 0.1, 1.5], np.float32), (1, N, 1)
    )  # tight gaussians, σ ≈ 0.8 px
    colors = rng.uniform(0, 1, size=(1, N, 3)).astype(np.float32)
    opacities = rng.uniform(0.3, 0.9, size=(1, N)).astype(np.float32)
    radii = np.full((1, N, 2), 3, np.int32)
    depths = rng.uniform(0.1, 10, size=(1, N)).astype(np.float32)
    return means2d, conics, colors, opacities, radii, depths, width, height


def _grads(means2d, conics, colors, opacities, radii, depths, width, height,
           tile_size=16):
    tw, th = width // tile_size, height // tile_size
    N = means2d.shape[1]
    res = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=1 << 10, max_tiles_per_gauss=16,
    )
    offsets = tiling.isect_offset_encode(res.isect_keys, 1, tw, th)
    tgt = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, height, width, 3)),
        jnp.float32,
    )

    def loss(m2d, dummy):
        img, _ = rasterize_to_pixels_jax(
            m2d, jnp.asarray(conics), jnp.asarray(colors),
            jnp.asarray(opacities), width, height, tile_size,
            offsets, res.flatten_ids, res.n_isects, tile_capacity=128,
            absgrad_dummy=dummy,
        )
        return jnp.sum((img - tgt) ** 2)

    g_signed, g_abs = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(means2d), jnp.zeros((N, 2))
    )
    return np.asarray(g_signed[0]), np.asarray(g_abs)


def test_absgrad_single_tile_equals_abs_of_signed():
    rng = np.random.default_rng(200)
    scene = make_single_tile_scene(rng)
    g_signed, g_abs = _grads(*scene)
    assert np.abs(g_signed).max() > 1e-4  # non-trivial gradients
    np.testing.assert_allclose(g_abs, np.abs(g_signed), rtol=1e-5, atol=1e-7)


def test_absgrad_dominates_signed_multi_tile():
    """Wide gaussians spanning tiles: per-tile contributions cancel in the
    signed sum but not in the abs accumulation."""
    rng = np.random.default_rng(201)
    tile_size, tw, th = 16, 3, 2
    width, height = tw * tile_size, th * tile_size
    N = 6
    means2d = rng.uniform(
        [12, 12], [width - 12, height - 12], size=(1, N, 2)
    ).astype(np.float32)
    conics = np.tile(np.array([0.01, 0.0, 0.01], np.float32), (1, N, 1))
    colors = rng.uniform(0, 1, size=(1, N, 3)).astype(np.float32)
    opacities = rng.uniform(0.3, 0.9, size=(1, N)).astype(np.float32)
    radii = np.full((1, N, 2), 40, np.int32)
    depths = rng.uniform(0.1, 10, size=(1, N)).astype(np.float32)
    g_signed, g_abs = _grads(
        means2d, conics, colors, opacities, radii, depths, width, height
    )
    assert (g_abs >= np.abs(g_signed) - 1e-7).all()
    assert g_abs.sum() > np.abs(g_signed).sum() * 1.05  # strict somewhere


def test_absgrad_packed_matches_jax():
    """The packed production path's abs tap agrees with the jnp oracle's
    through the full rasterization() API."""
    rng = np.random.default_rng(202)
    N = 64
    means = rng.normal(size=(N, 3)).astype(np.float32) * 0.6 + [0, 0, 6.0]
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(-2.5, -1.2, size=(N, 3))).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, size=(N,)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    viewmats = np.eye(4, dtype=np.float32)[None]
    Ks = np.array([[[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]]], np.float32)
    width, height = 64, 48
    tgt = jnp.asarray(rng.uniform(size=(1, height, width, 3)), jnp.float32)

    def loss(dummy, rasterizer):
        img, _, _ = rasterization(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors),
            jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
            rasterizer=rasterizer, means2d_abs_tap=dummy,
            tile_capacity=256, max_tiles_per_gauss=16,
        )
        return jnp.sum((img - tgt) ** 2)

    dummy = jnp.zeros((1, N, 2))
    g_jax = jax.grad(lambda d: loss(d, "jax"))(dummy)
    g_packed = jax.grad(lambda d: loss(d, "packed"))(dummy)
    assert np.abs(np.asarray(g_jax)).max() > 1e-5
    np.testing.assert_allclose(
        np.asarray(g_packed), np.asarray(g_jax), rtol=1e-3, atol=1e-5
    )


def test_absgrad_2dgs_packed_matches_jax():
    """The 2DGS abs tap (reference rasterization_2dgs(absgrad=True) →
    RasterizeToPixels2DGSBwd.cu v_means2d_abs): packed production path
    agrees with the jnp oracle through the full rasterization_2dgs API."""
    from tdgs.rendering import rasterization_2dgs

    rng = np.random.default_rng(203)
    N = 64
    means = rng.normal(size=(N, 3)).astype(np.float32) * 0.6 + [0, 0, 6.0]
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(-2.5, -1.2, size=(N, 3))).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, size=(N,)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    viewmats = np.eye(4, dtype=np.float32)[None]
    Ks = np.array([[[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]]], np.float32)
    width, height = 64, 48
    tgt = jnp.asarray(rng.uniform(size=(1, height, width, 3)), jnp.float32)

    def loss(dummy, rasterizer):
        out = rasterization_2dgs(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(colors),
            jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
            rasterizer=rasterizer, absgrad=True, means2d_abs_tap=dummy,
            tile_capacity=256, max_tiles_per_gauss=16,
        )
        return jnp.sum((out[0] - tgt) ** 2)

    dummy = jnp.zeros((1, N, 2))
    g_jax = jax.grad(lambda d: loss(d, "jax"))(dummy)
    g_packed = jax.grad(lambda d: loss(d, "packed"))(dummy)
    assert np.abs(np.asarray(g_jax)).max() > 1e-5
    assert float(jnp.min(g_jax)) >= 0.0  # |·| accumulations
    np.testing.assert_allclose(
        np.asarray(g_packed), np.asarray(g_jax), rtol=1e-3, atol=1e-5
    )
