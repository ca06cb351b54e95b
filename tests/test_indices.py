"""Index rasterizer + accumulate() vs the fused path (the reference's
'slow reference path' equivalence: _rasterization ≈ rasterization)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tdgs.ops import tiling
from tdgs.ops.indices import accumulate, rasterize_to_indices_in_range
from tdgs.ops.rasterize_jax import rasterize_to_pixels_jax
from tests.test_rasterize import make_raster_inputs
from tests import oracles


@pytest.mark.slow
def test_index_path_matches_fused():
    rng = np.random.default_rng(150)
    tile_size = 16
    width, height = 48, 32
    means2d, conics, colors, opacities, radii, depths, tw, th = (
        make_raster_inputs(rng, N=32, width=width, height=height)
    )
    I = 1
    entries = oracles.isect_tiles_np(means2d, radii, depths, tile_size, tw, th)
    res = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=len(entries) + 8, max_tiles_per_gauss=64,
    )
    offsets = tiling.isect_offset_encode(res.isect_keys, I, tw, th)

    # one full-range pass: indices + accumulate == fused rasterizer
    gs, pix, img_ids, valid = rasterize_to_indices_in_range(
        0, 2, jnp.ones((I, height, width)),
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(opacities),
        width, height, tile_size, offsets, res.flatten_ids, res.n_isects,
    )
    rend, alph = accumulate(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(opacities),
        jnp.asarray(colors), gs, pix, img_ids, width, height, valid=valid,
    )

    img_f, alp_f = rasterize_to_pixels_jax(
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities), width, height, tile_size,
        offsets, res.flatten_ids, res.n_isects, tile_capacity=128,
    )
    np.testing.assert_allclose(
        np.asarray(rend), np.asarray(img_f), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(alph), np.asarray(alp_f), rtol=1e-3, atol=1e-3
    )


@pytest.mark.slow
def test_accumulate_differentiable():
    rng = np.random.default_rng(151)
    means2d, conics, colors, opacities, radii, depths, tw, th = (
        make_raster_inputs(rng, N=12, width=32, height=32)
    )
    res = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        16, tw, th, capacity=1 << 10, max_tiles_per_gauss=64,
    )
    offsets = tiling.isect_offset_encode(res.isect_keys, 1, tw, th)
    gs, pix, img_ids, valid = rasterize_to_indices_in_range(
        0, 1, jnp.ones((1, 32, 32)),
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(opacities),
        32, 32, 16, offsets, res.flatten_ids, res.n_isects,
    )

    def loss(col):
        rend, _ = accumulate(
            jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(opacities),
            col, gs, pix, img_ids, 32, 32, valid=valid,
        )
        return jnp.sum(rend**2)

    g = jax.grad(loss)(jnp.asarray(colors))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


@pytest.mark.slow
def test_index_path_2dgs_matches_fused():
    """2DGS index rasterizer + accumulate_2dgs == the fused surfel
    rasterizer (reference RasterizeToIndices2DGS.cu equivalence)."""
    from tdgs.ops.indices import (
        accumulate_2dgs,
        rasterize_to_indices_in_range_2dgs,
    )
    from tdgs.ops.projection_2dgs import fully_fused_projection_2dgs
    from tdgs.ops.rasterize_2dgs_jax import rasterize_to_pixels_2dgs_jax
    from tests.test_2dgs import make_surfel_scene

    rng = np.random.default_rng(160)
    means, quats, scales, opac, colors, viewmats, Ks, width, height = (
        make_surfel_scene(rng, N=32, C=1)
    )
    radii, means2d, depths, M, normals = fully_fused_projection_2dgs(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), width, height,
    )
    tile_size = 16
    tw, th = -(-width // tile_size), -(-height // tile_size)
    res = tiling.isect_tiles(
        means2d, radii, depths, tile_size, tw, th,
        capacity=1 << 12, max_tiles_per_gauss=32,
    )
    offsets = tiling.isect_offset_encode(res.isect_keys, 1, tw, th)
    op_c = jnp.broadcast_to(jnp.asarray(opac)[None], means2d.shape[:-1])
    col_c = jnp.broadcast_to(jnp.asarray(colors)[None],
                             means2d.shape[:-1] + (3,))

    gs, pix, img_ids, valid = rasterize_to_indices_in_range_2dgs(
        0, 4, jnp.ones((1, height, width)),
        means2d, M, op_c, width, height, tile_size,
        offsets, res.flatten_ids, res.n_isects,
    )
    rend, alph = accumulate_2dgs(
        means2d, M, op_c, col_c, gs, pix, img_ids, width, height,
        valid=valid,
    )
    img_f, alp_f, _, _, _ = rasterize_to_pixels_2dgs_jax(
        means2d, M, col_c, jnp.broadcast_to(jnp.asarray(normals),
                                            means2d.shape[:-1] + (3,)),
        op_c, width, height, tile_size, offsets, res.flatten_ids,
        res.n_isects, tile_capacity=256,
    )
    np.testing.assert_allclose(
        np.asarray(rend), np.asarray(img_f), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(alph), np.asarray(alp_f), rtol=1e-3, atol=1e-3
    )
