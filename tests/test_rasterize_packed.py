"""Packed fast path vs the jnp oracle path (CPU interpret mode — tiny)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.ops import tiling
from tdgs.ops import rasterize_jax as RJ
from tdgs.ops.rasterize_pallas_packed import rasterize_to_pixels_packed
from tdgs.rendering import rasterization
from tests.test_rasterize import make_raster_inputs


def test_packed_isect_matches_exact_ordering():
    rng = np.random.default_rng(110)
    means2d, conics, colors, opacities, radii, depths, tw, th = make_raster_inputs(
        rng, N=32, width=48, height=32
    )
    I = 1
    res = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        16, tw, th, max_tiles_per_gauss=64,
    )
    exact = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        16, tw, th, capacity=1 << 12, max_tiles_per_gauss=64,
    )
    n = int(res.n_isects)
    assert n == int(exact.n_isects)
    # same per-tile membership; order within tile may differ only where
    # quantized depths tie
    offs = np.asarray(res.offsets)
    exact_offs = np.asarray(
        tiling.isect_offset_encode(exact.isect_keys, I, tw, th)
    ).reshape(-1)
    np.testing.assert_array_equal(offs[:-1][: len(exact_offs)], exact_offs)
    fid_p = np.asarray(res.flatten_ids)
    fid_e = np.asarray(exact.flatten_ids)
    for t in range(len(exact_offs)):
        s, e = offs[t], offs[t + 1]
        assert set(fid_p[s:e]) == set(fid_e[s:e])
    # depth order within tiles respected (monotone keys)
    keys = np.asarray(res.isect_keys)[:n]
    assert (np.diff(keys) >= 0).all()


@pytest.mark.parametrize("with_bg", [False, True])
def test_packed_forward_matches_jax(with_bg):
    rng = np.random.default_rng(111)
    tile_size = 16
    width, height = 48, 32
    means2d, conics, colors, opacities, radii, depths, tw, th = make_raster_inputs(
        rng, N=40, width=width, height=height
    )
    I = 1
    bg = rng.uniform(0, 1, size=(I, 3)).astype(np.float32) if with_bg else None

    resp = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, max_tiles_per_gauss=64,
    )
    img_p, alp_p = rasterize_to_pixels_packed(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities), width, height, tile_size,
        resp.offsets, resp.flatten_ids,
        backgrounds=None if bg is None else jnp.asarray(bg),
        tile_capacity=256,
    )

    rese = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=1 << 12, max_tiles_per_gauss=64,
    )
    offsets_e = tiling.isect_offset_encode(rese.isect_keys, I, tw, th)
    img_j, alp_j = RJ.rasterize_to_pixels_jax(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities), width, height, tile_size,
        offsets_e, rese.flatten_ids, rese.n_isects,
        backgrounds=None if bg is None else jnp.asarray(bg),
        tile_capacity=256,
    )
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_j), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(alp_p), np.asarray(alp_j), rtol=2e-3, atol=2e-3
    )


def test_packed_grads_match_jax():
    rng = np.random.default_rng(112)
    tile_size = 16
    width = height = 32
    means2d, conics, colors, opacities, radii, depths, tw, th = make_raster_inputs(
        rng, N=20, width=width, height=height
    )
    I = 1
    tgt = rng.uniform(0, 1, size=(1, height, width, 3)).astype(np.float32)

    resp = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, max_tiles_per_gauss=64,
    )
    rese = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=1 << 11, max_tiles_per_gauss=64,
    )
    offsets_e = tiling.isect_offset_encode(rese.isect_keys, I, tw, th)

    def loss_p(m, c, col, op):
        img, alpha = rasterize_to_pixels_packed(
            m, c, col, op, width, height, tile_size,
            resp.offsets, resp.flatten_ids, tile_capacity=256,
        )
        return jnp.sum((img - jnp.asarray(tgt)) ** 2) + 0.1 * jnp.sum(alpha)

    def loss_j(m, c, col, op):
        img, alpha = RJ.rasterize_to_pixels_jax(
            m, c, col, op, width, height, tile_size,
            offsets_e, rese.flatten_ids, rese.n_isects, tile_capacity=256,
        )
        return jnp.sum((img - jnp.asarray(tgt)) ** 2) + 0.1 * jnp.sum(alpha)

    args = (jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
            jnp.asarray(opacities))
    g_p = jax.grad(loss_p, argnums=(0, 1, 2, 3))(*args)
    g_j = jax.grad(loss_j, argnums=(0, 1, 2, 3))(*args)
    for n, gp, gj in zip(["means2d", "conics", "colors", "opac"], g_p, g_j):
        gp, gj = np.asarray(gp), np.asarray(gj)
        assert np.isfinite(gp).all(), n
        scale = np.abs(gj).max() + 1e-8
        assert np.abs(gp - gj).max() / scale < 3e-2, (n, np.abs(gp - gj).max())


def test_rasterization_packed_end_to_end():
    rng = np.random.default_rng(113)
    N, C = 48, 1
    means = rng.normal(size=(N, 3)).astype(np.float32) + [0, 0, 5]
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.3, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 1, size=(N,)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    viewmats = np.eye(4, dtype=np.float32)[None]
    Ks = np.array([[[60.0, 0, 32], [0, 60, 24], [0, 0, 1]]], np.float32)
    img_p, alp_p, meta = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks), 64, 48, rasterizer="packed", tile_capacity=256,
    )
    img_j, alp_j, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks), 64, 48, rasterizer="jax", tile_capacity=256,
    )
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_j), rtol=2e-3, atol=2e-3
    )


def test_packed_inference_matches_jax():
    """The unaligned-start inference kernel must match the oracle path."""
    from tdgs.rendering import rasterization

    rng = np.random.default_rng(114)
    N = 48
    means = rng.normal(size=(N, 3)).astype(np.float32) + [0, 0, 5]
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.3, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 1, size=(N,)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    viewmats = np.eye(4, dtype=np.float32)[None]
    Ks = np.array([[[60.0, 0, 32], [0, 60, 24], [0, 0, 1]]], np.float32)
    img_p, alp_p, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks), 64, 48, rasterizer="packed_inference",
        tile_capacity=256,
    )
    img_j, alp_j, _ = rasterization(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(viewmats),
        jnp.asarray(Ks), 64, 48, rasterizer="jax", tile_capacity=256,
    )
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_j), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(alp_p), np.asarray(alp_j), rtol=2e-3, atol=2e-3
    )


def test_packed_truncation_matches_jax():
    """Overflowing tiles (raw count > tile_capacity) exercise the backward
    kernel's carry-invalidation + gap zero-fill protocol."""
    rng = np.random.default_rng(117)
    tile_size = 16
    width = height = 32
    # every gaussian covers most tiles -> per-tile raw counts ~N >> 128
    means2d, conics, colors, opacities, radii, depths, tw, th = make_raster_inputs(
        rng, N=300, width=width, height=height
    )
    radii = np.maximum(radii, 24)  # force heavy overlap
    I = 1
    cap = 128  # one chunk: truncation everywhere
    tgt = rng.uniform(0, 1, size=(1, height, width, 3)).astype(np.float32)

    resp = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, max_tiles_per_gauss=64,
    )
    rese = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=1 << 15, max_tiles_per_gauss=64,
    )
    offsets_e = tiling.isect_offset_encode(rese.isect_keys, I, tw, th)
    raw_counts = np.diff(np.asarray(resp.offsets))
    assert (raw_counts > cap).sum() >= 2, "scene must overflow several tiles"

    def loss_p(m, c, col, op):
        img, alpha = rasterize_to_pixels_packed(
            m, c, col, op, width, height, tile_size,
            resp.offsets, resp.flatten_ids, tile_capacity=cap,
        )
        return jnp.sum((img - jnp.asarray(tgt)) ** 2) + 0.1 * jnp.sum(alpha)

    def loss_j(m, c, col, op):
        img, alpha = RJ.rasterize_to_pixels_jax(
            m, c, col, op, width, height, tile_size,
            offsets_e, rese.flatten_ids, rese.n_isects, tile_capacity=cap,
        )
        return jnp.sum((img - jnp.asarray(tgt)) ** 2) + 0.1 * jnp.sum(alpha)

    args = (jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
            jnp.asarray(opacities))
    lp, g_p = jax.value_and_grad(loss_p, argnums=(0, 1, 2, 3))(*args)
    lj, g_j = jax.value_and_grad(loss_j, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(lp), float(lj), rtol=1e-3)
    for n, gp, gj in zip(["means2d", "conics", "colors", "opac"], g_p, g_j):
        gp, gj = np.asarray(gp), np.asarray(gj)
        assert np.isfinite(gp).all(), n
        scale = np.abs(gj).max() + 1e-8
        assert np.abs(gp - gj).max() / scale < 3e-2, (n, np.abs(gp - gj).max())
