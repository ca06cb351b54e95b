import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.ops import tiling
from tdgs.ops import rasterize_jax as R
from tests import oracles


def make_raster_inputs(rng, I=1, N=48, width=48, height=32, tile_size=16, opaque=False):
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    means2d = rng.uniform(0, [width, height], size=(I, N, 2)).astype(np.float32)
    # random well-conditioned conics via inverse of SPD 2x2
    A = rng.normal(size=(I, N, 2, 2)).astype(np.float32)
    cov = A @ np.swapaxes(A, -1, -2) + 2.0 * np.eye(2, dtype=np.float32)
    inv = np.linalg.inv(cov)
    conics = np.stack([inv[..., 0, 0], inv[..., 0, 1], inv[..., 1, 1]], -1).astype(
        np.float32
    )
    colors = rng.uniform(0, 1, size=(I, N, 3)).astype(np.float32)
    if opaque:
        opacities = rng.uniform(0.9, 1.0, size=(I, N)).astype(np.float32)
    else:
        opacities = rng.uniform(0.05, 0.95, size=(I, N)).astype(np.float32)
    # radius from conic's covariance diag
    rx = np.ceil(3.33 * np.sqrt(cov[..., 0, 0]))
    ry = np.ceil(3.33 * np.sqrt(cov[..., 1, 1]))
    radii = np.stack([rx, ry], -1).astype(np.int32)
    depths = rng.uniform(0.1, 10, size=(I, N)).astype(np.float32)
    return means2d, conics, colors, opacities, radii, depths, tw, th


@pytest.mark.parametrize("opaque", [False, True])
@pytest.mark.parametrize("with_bg", [False, True])
def test_rasterize_matches_sequential_oracle(opaque, with_bg):
    """The parallel prefix-product compositing must match the sequential
    CUDA-semantics loop bit-for-bit in behavior (incl. 0.999 clamp, 1/255
    skip, exclusive 1e-4 cutoff)."""
    rng = np.random.default_rng(31)
    tile_size = 16
    width, height = 48, 32
    (means2d, conics, colors, opacities, radii, depths, tw, th) = make_raster_inputs(
        rng, opaque=opaque
    )
    I, N = means2d.shape[:2]
    backgrounds = (
        rng.uniform(0, 1, size=(I, 3)).astype(np.float32) if with_bg else None
    )

    entries = oracles.isect_tiles_np(means2d, radii, depths, tile_size, tw, th)
    want_img, want_alpha = oracles.rasterize_np(
        means2d, conics, colors, opacities, width, height, tile_size,
        entries, tw, th, backgrounds=backgrounds,
    )

    res = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=len(entries) + 8, max_tiles_per_gauss=64,
    )
    offsets = tiling.isect_offset_encode(res.isect_keys, I, tw, th)
    got_img, got_alpha = R.rasterize_to_pixels_jax(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities), width, height, tile_size,
        offsets, res.flatten_ids, res.n_isects,
        backgrounds=None if backgrounds is None else jnp.asarray(backgrounds),
        tile_capacity=128,
    )
    np.testing.assert_allclose(np.asarray(got_img), want_img, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_alpha)[..., 0], want_alpha, rtol=1e-4, atol=1e-4
    )


def test_rasterize_empty_scene():
    tile_size = 16
    width, height = 32, 32
    I, N = 1, 4
    means2d = jnp.zeros((I, N, 2))
    conics = jnp.ones((I, N, 3))
    colors = jnp.ones((I, N, 3))
    opacities = jnp.zeros((I, N))
    res = tiling.isect_tiles(
        means2d, jnp.zeros((I, N, 2), jnp.int32), jnp.ones((I, N)),
        tile_size, 2, 2, capacity=16,
    )
    offsets = tiling.isect_offset_encode(res.isect_keys, I, 2, 2)
    img, alpha = R.rasterize_to_pixels_jax(
        means2d, conics, colors, opacities, width, height, tile_size,
        offsets, res.flatten_ids, res.n_isects, tile_capacity=8,
    )
    assert np.all(np.asarray(img) == 0.0)
    assert np.all(np.asarray(alpha) == 0.0)


def test_rasterize_gradients_finite_and_match_fd():
    rng = np.random.default_rng(32)
    tile_size = 16
    width, height = 32, 32
    (means2d, conics, colors, opacities, radii, depths, tw, th) = make_raster_inputs(
        rng, N=12, width=width, height=height
    )
    I = 1
    entries = oracles.isect_tiles_np(means2d, radii, depths, tile_size, tw, th)
    res = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=len(entries) + 8, max_tiles_per_gauss=64,
    )
    offsets = tiling.isect_offset_encode(res.isect_keys, I, tw, th)

    def loss(means2d_, colors_, opacities_):
        img, alpha = R.rasterize_to_pixels_jax(
            means2d_, jnp.asarray(conics), colors_, opacities_,
            width, height, tile_size, offsets, res.flatten_ids, res.n_isects,
            tile_capacity=64,
        )
        return jnp.sum(img**2) + jnp.sum(alpha)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(means2d), jnp.asarray(colors), jnp.asarray(opacities)
    )
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
    # finite differences on a few color entries (colors affect loss linearly
    # through weights — cleanest FD check)
    eps = 1e-3
    g_col = np.asarray(g[1])
    base = float(loss(jnp.asarray(means2d), jnp.asarray(colors), jnp.asarray(opacities)))
    for (i, n, d) in [(0, 0, 0), (0, 5, 1), (0, 11, 2)]:
        pert = colors.copy()
        pert[i, n, d] += eps
        up = float(loss(jnp.asarray(means2d), jnp.asarray(pert), jnp.asarray(opacities)))
        fd = (up - base) / eps
        np.testing.assert_allclose(g_col[i, n, d], fd, rtol=5e-2, atol=5e-3)


def test_tile_capacity_truncation_keeps_front():
    """When a tile overflows tile_capacity, the nearest gaussians win."""
    rng = np.random.default_rng(33)
    tile_size = 16
    width = height = 16
    N = 20
    means2d = np.full((1, N, 2), 8.0, dtype=np.float32)
    conics = np.tile(np.array([0.5, 0.0, 0.5], np.float32), (1, N, 1))
    colors = rng.uniform(0, 1, size=(1, N, 3)).astype(np.float32)
    opacities = np.full((1, N), 0.02, dtype=np.float32)  # low → no early-out
    radii = np.full((1, N, 2), 4, dtype=np.int32)
    depths = np.arange(N, dtype=np.float32)[None, :] + 1.0

    entries = oracles.isect_tiles_np(means2d, radii, depths, tile_size, 1, 1)
    res = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, 1, 1, capacity=N,
    )
    offsets = tiling.isect_offset_encode(res.isect_keys, 1, 1, 1)

    full_img, _ = R.rasterize_to_pixels_jax(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities), width, height, tile_size,
        offsets, res.flatten_ids, res.n_isects, tile_capacity=N,
    )
    trunc_img, _ = R.rasterize_to_pixels_jax(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities), width, height, tile_size,
        offsets, res.flatten_ids, res.n_isects, tile_capacity=10,
    )
    # truncated render only keeps the 10 nearest; difference is bounded by
    # the tail contribution which is < product of (1-alpha_front)
    diff = np.abs(np.asarray(full_img) - np.asarray(trunc_img)).max()
    assert diff < 0.2
    # and they agree when capacity covers everything
    trunc2, _ = R.rasterize_to_pixels_jax(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities), width, height, tile_size,
        offsets, res.flatten_ids, res.n_isects, tile_capacity=32,
    )
    np.testing.assert_allclose(np.asarray(full_img), np.asarray(trunc2), atol=1e-6)
