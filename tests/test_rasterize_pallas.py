"""Pallas rasterizer vs the jnp oracle path.

CPU runs use interpret mode (slow!) so sizes here are tiny; the authoritative
check runs the same comparison at scale on the real TPU (see
tests/tpu/README — driver bench also exercises the kernel). Tolerances allow
for the kernel's log-space prefix product vs the oracle's direct cumprod.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.ops import tiling
from tdgs.ops import rasterize_jax as RJ
from tdgs.ops import rasterize_pallas as RP
from tests.test_rasterize import make_raster_inputs
from tests import oracles


def setup(rng, **kw):
    tile_size = 16
    width, height = kw.pop("width", 32), kw.pop("height", 32)
    vals = make_raster_inputs(rng, width=width, height=height, **kw)
    means2d, conics, colors, opacities, radii, depths, tw, th = vals
    I = means2d.shape[0]
    entries = oracles.isect_tiles_np(means2d, radii, depths, tile_size, tw, th)
    res = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=len(entries) + 8, max_tiles_per_gauss=64,
    )
    offsets = tiling.isect_offset_encode(res.isect_keys, I, tw, th)
    return (means2d, conics, colors, opacities, offsets, res, tile_size,
            width, height)


def test_pallas_forward_matches_jax():
    rng = np.random.default_rng(41)
    (means2d, conics, colors, opacities, offsets, res, tile_size,
     width, height) = setup(rng, N=24)
    I = means2d.shape[0]
    bg = rng.uniform(0, 1, size=(I, 3)).astype(np.float32)

    args = (
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities), width, height, tile_size,
        offsets, res.flatten_ids, res.n_isects,
    )
    kw = dict(backgrounds=jnp.asarray(bg), tile_capacity=128)
    img_j, alp_j = RJ.rasterize_to_pixels_jax(*args, **kw)
    img_p, alp_p = RP.rasterize_to_pixels_pallas(*args, **kw)
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_j), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(alp_p), np.asarray(alp_j), rtol=1e-3, atol=2e-3
    )


def test_pallas_grads_match_jax():
    rng = np.random.default_rng(42)
    (means2d, conics, colors, opacities, offsets, res, tile_size,
     width, height) = setup(rng, N=16)
    tgt = rng.uniform(0, 1, size=(1, height, width, 3)).astype(np.float32)

    def loss(fn, m, c, col, op):
        img, alpha = fn(
            m, c, col, op, width, height, tile_size,
            offsets, res.flatten_ids, res.n_isects, tile_capacity=128,
        )
        return jnp.sum((img - jnp.asarray(tgt)) ** 2) + 0.1 * jnp.sum(alpha)

    args = (
        jnp.asarray(means2d), jnp.asarray(conics), jnp.asarray(colors),
        jnp.asarray(opacities),
    )
    g_j = jax.grad(lambda *a: loss(RJ.rasterize_to_pixels_jax, *a),
                   argnums=(0, 1, 2, 3))(*args)
    g_p = jax.grad(lambda *a: loss(RP.rasterize_to_pixels_pallas, *a),
                   argnums=(0, 1, 2, 3))(*args)
    names = ["means2d", "conics", "colors", "opacities"]
    for n, gj, gp in zip(names, g_j, g_p):
        gj, gp = np.asarray(gj), np.asarray(gp)
        assert np.isfinite(gp).all(), n
        scale = np.abs(gj).max() + 1e-8
        assert np.abs(gp - gj).max() / scale < 2e-2, (
            n, np.abs(gp - gj).max(), scale
        )
