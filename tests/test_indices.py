"""Index rasterizer + accumulate() vs the fused path (the reference's
'slow reference path' equivalence: _rasterization ≈ rasterization)."""

import numpy as np
import jax
import jax.numpy as jnp

from tdgs.ops import tiling
from tdgs.ops.indices import accumulate, rasterize_to_indices_in_range
from tdgs.ops.rasterize_jax import rasterize_to_pixels_jax
from tests.test_rasterize import make_raster_inputs
from tests import oracles


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
