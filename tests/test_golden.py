"""compose_reference_f64 (tdgs/utils/golden.py) parity with the renderer."""

import numpy as np
import jax
import jax.numpy as jnp

from tdgs.ops.sh import spherical_harmonics
from tdgs.rendering import rasterization
from tdgs.utils.golden import compose_reference_f64


def test_compose_reference_matches_render():
    rng = np.random.default_rng(31)
    n = 120
    means = rng.normal(size=(n, 3)).astype(np.float32) * [0.8, 0.6, 0.3]
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.03, 0.12, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    sh = (rng.normal(size=(n, 16, 3)) * 0.3).astype(np.float32)
    vm = np.eye(4, dtype=np.float32); vm[2, 3] = 3.0
    K = np.array([[110.0, 0, 64], [0, 110.0, 48], [0, 0, 1]], np.float32)
    W, H = 128, 96
    bkgd = np.array([0.3, 0.5, 0.7], np.float32)
    j = jnp.asarray
    img, alpha, meta = rasterization(
        j(means), j(quats), j(scales), j(opac), j(sh),
        j(vm)[None], j(K)[None], W, H, sh_degree=3,
        backgrounds=j(bkgd)[None], tile_capacity=256,
        isect_exact=True, isect_exact_depth=True, rasterizer="jax",
    )
    campos = -vm[:3, :3].T @ vm[:3, 3]
    cols = np.clip(
        np.asarray(spherical_harmonics(3, j(means - campos), j(sh))) + 0.5,
        0.0, None,
    )
    ref = compose_reference_f64(
        np.asarray(meta["isect_offsets"]), np.asarray(meta["flatten_ids"]),
        np.asarray(meta["means2d"]).reshape(-1, 2),
        np.asarray(meta["conics"]).reshape(-1, 3),
        cols, opac, W, H, meta["tile_size"], meta["tile_width"],
        meta["tile_height"], background=bkgd.astype(np.float64),
        n_isects=int(meta["n_isects"]),
    )
    assert np.asarray(alpha).max() > 0.3  # scene is visible
    np.testing.assert_allclose(np.asarray(img[0]), ref, atol=2e-4)


def test_compose_reference_2dgs_matches_packed_render():
    """The 2DGS f64 golden compositor must match the packed production
    kernel over the SAME intersection stream (kernel-level: shared
    projection + tiling, so only the compositing math is under test)."""
    from tdgs.ops.projection_2dgs import fully_fused_projection_2dgs
    from tdgs.ops.rasterize_2dgs_pallas import (
        rasterize_to_pixels_2dgs_packed,
    )
    from tdgs.ops.tiling import isect_tiles_packed
    from tdgs.utils.golden import compose_reference_2dgs_f64

    rng = np.random.default_rng(7)
    n = 120
    W, H, TS = 128, 96, 16
    means = (
        rng.normal(size=(n, 3)).astype(np.float32) * [0.9, 0.7, 0.5]
        + [0, 0, 5]
    )
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.05, 0.2, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(1, n, 3)).astype(np.float32)
    vm = np.eye(4, dtype=np.float32)[None]
    K = np.array([[[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]]], np.float32)

    j = jnp.asarray
    radii, means2d, depths, M, normals = fully_fused_projection_2dgs(
        j(means), j(quats), j(scales), j(vm), j(K), W, H
    )
    tw, th = -(-W // TS), -(-H // TS)
    isect = isect_tiles_packed(
        means2d, radii, depths, TS, tw, th,
        max_tiles_per_gauss=32, capacity=1 << 13, exact_depth=True,
    )
    assert int(isect.n_dropped) == 0

    out = rasterize_to_pixels_2dgs_packed(
        means2d, M, j(colors), normals, j(opac)[None], W, H, TS,
        isect.offsets, isect.flatten_ids, tile_capacity=512,
    )
    img, alp = np.asarray(out[0]), np.asarray(out[1])

    ch = np.concatenate(
        [colors.reshape(n, 3), np.asarray(normals).reshape(n, 3)], axis=-1
    )
    gold, galp = compose_reference_2dgs_f64(
        np.asarray(isect.offsets), np.asarray(isect.flatten_ids),
        np.asarray(means2d).reshape(-1, 2), np.asarray(M).reshape(-1, 3, 3),
        ch, opac, W, H, TS, tw, th,
    )
    assert galp.max() > 0.5  # scene is visible
    np.testing.assert_allclose(img[0, ..., :3], gold[..., :3], atol=2e-3)
    np.testing.assert_allclose(alp[0, ..., 0], galp, atol=2e-3)
