"""Tile intersection + depth sorting for tile-based rasterization.

Replaces the reference's CUB radix-sort pipeline
(gsplat/cuda/csrc/IntersectTile.cu: two-pass count/expand producing 64-bit
``image|tile|depth-bits`` keys, DeviceRadixSort, and the offset-scatter
kernel; oracle gsplat/cuda/_torch_impl.py:_isect_tiles).

TPU-first design (SURVEY.md §7 delta 2):
- The dynamic ``n_isects`` becomes a **static capacity** buffer. Each
  (gaussian, covered-tile) pair is scattered into the buffer at
  cumsum-derived offsets; unused slots carry a sentinel key that sorts to
  the end. Overflow beyond capacity is dropped (counted in ``n_dropped``)
  so callers can grow capacity and re-jit.
- The 64-bit packed key becomes a **lexicographic 2-key sort**
  (int32 ``image*n_tiles + tile`` major, float32 depth minor) via
  ``jax.lax.sort`` — no int64, no float-bit tricks needed.
- Per-tile ranges come from ``jnp.searchsorted`` on the sorted keys instead
  of a scatter kernel.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

INT32_SENTINEL = jnp.iinfo(jnp.int32).max


class IsectResult(NamedTuple):
    """Sorted intersection buffers (all static-shape, length = capacity)."""

    tiles_per_gauss: jnp.ndarray  # [..., N] int32
    isect_keys: jnp.ndarray  # [capacity] int32: image_id * n_tiles + tile_id, sorted
    isect_depths: jnp.ndarray  # [capacity] float32, sorted within each key
    flatten_ids: jnp.ndarray  # [capacity] int32: image_id * N + gaussian_id
    n_isects: jnp.ndarray  # [] int32, number of valid entries (<= capacity)
    n_dropped: jnp.ndarray  # [] int32, intersections that did not fit


def isect_tiles(
    means2d: jnp.ndarray,  # [..., N, 2]
    radii: jnp.ndarray,  # [..., N, 2] (int32 or float)
    depths: jnp.ndarray,  # [..., N]
    tile_size: int,
    tile_width: int,
    tile_height: int,
    capacity: int,
    max_tiles_per_gauss: int = 32,
    sort: bool = True,
) -> IsectResult:
    """Compute sorted (tile, depth) intersection lists at fixed capacity.

    Image dims (everything before N) are flattened to I images, matching the
    reference's key layout. A gaussian covering more than
    ``max_tiles_per_gauss`` tiles keeps only the first tiles in row-major
    order of its AABB (counted in ``n_dropped``) — pick ``max_tiles_per_gauss``
    comfortably above the opacity-aware radius bound's typical footprint.
    """
    image_dims = means2d.shape[:-2]
    N = means2d.shape[-2]
    I = math.prod(image_dims) if image_dims else 1
    K = max_tiles_per_gauss

    means2d_f = means2d.reshape(I, N, 2)
    radii_f = radii.reshape(I, N, 2).astype(means2d_f.dtype)
    depths_f = depths.reshape(I, N).astype(jnp.float32)

    tile_means = means2d_f / tile_size
    tile_radii = radii_f / tile_size
    tile_mins = jnp.floor(tile_means - tile_radii).astype(jnp.int32)
    tile_maxs = jnp.ceil(tile_means + tile_radii).astype(jnp.int32)
    tile_mins = jnp.clip(
        tile_mins, 0, jnp.array([tile_width, tile_height], dtype=jnp.int32)
    )
    tile_maxs = jnp.clip(
        tile_maxs, 0, jnp.array([tile_width, tile_height], dtype=jnp.int32)
    )
    w_g = tile_maxs[..., 0] - tile_mins[..., 0]  # [I, N]
    h_g = tile_maxs[..., 1] - tile_mins[..., 1]
    alive = (radii_f > 0.0).all(axis=-1)
    tiles_full = jnp.where(alive, w_g * h_g, 0)  # true tile count
    tiles_capped = jnp.minimum(tiles_full, K)

    # Offsets into the capacity buffer (row-major over images then gaussians,
    # same enumeration order as the reference's cumsum).
    cum = jnp.cumsum(tiles_capped.reshape(-1))
    total = cum[-1]
    starts = (cum - tiles_capped.reshape(-1)).reshape(I, N)

    # Enumerate each gaussian's k-th covered tile (row-major in its AABB).
    k_idx = jnp.arange(K, dtype=jnp.int32)[None, None, :]  # [1, 1, K]
    w_safe = jnp.maximum(w_g, 1)[..., None]
    dy = k_idx // w_safe
    dx = k_idx % w_safe
    tile_x = tile_mins[..., 0:1] + dx
    tile_y = tile_mins[..., 1:2] + dy
    tile_id = tile_y * tile_width + tile_x  # [I, N, K]

    img_ids = jnp.arange(I, dtype=jnp.int32)[:, None, None]
    keys = img_ids * (tile_width * tile_height) + tile_id
    fids = jnp.broadcast_to(
        img_ids * N + jnp.arange(N, dtype=jnp.int32)[None, :, None], (I, N, K)
    )
    deps = jnp.broadcast_to(depths_f[..., None], (I, N, K))

    valid_k = k_idx < tiles_capped[..., None]
    pos = starts[..., None] + k_idx  # [I, N, K]
    # Invalid or overflowing entries get an out-of-bounds position → dropped.
    pos = jnp.where(valid_k & (pos < capacity), pos, capacity)

    buf_keys = jnp.full((capacity,), INT32_SENTINEL, dtype=jnp.int32)
    buf_deps = jnp.full((capacity,), jnp.inf, dtype=jnp.float32)
    buf_fids = jnp.zeros((capacity,), dtype=jnp.int32)

    pos_flat = pos.reshape(-1)
    buf_keys = buf_keys.at[pos_flat].set(keys.reshape(-1), mode="drop")
    buf_deps = buf_deps.at[pos_flat].set(deps.reshape(-1), mode="drop")
    buf_fids = buf_fids.at[pos_flat].set(fids.reshape(-1), mode="drop")

    if sort:
        buf_keys, buf_deps, buf_fids = jax.lax.sort(
            (buf_keys, buf_deps, buf_fids), num_keys=2, is_stable=True
        )

    n_isects = jnp.minimum(total, capacity).astype(jnp.int32)
    n_dropped = (
        jnp.sum(tiles_full - tiles_capped) + jnp.maximum(total - capacity, 0)
    ).astype(jnp.int32)

    return IsectResult(
        tiles_per_gauss=tiles_full.reshape(image_dims + (N,)).astype(jnp.int32),
        isect_keys=buf_keys,
        isect_depths=buf_deps,
        flatten_ids=buf_fids,
        n_isects=n_isects,
        n_dropped=n_dropped,
    )


def isect_offset_encode(
    isect_keys: jnp.ndarray,  # [capacity] sorted int32 keys
    I: int,
    tile_width: int,
    tile_height: int,
) -> jnp.ndarray:
    """Per-tile start offsets into the sorted intersection buffer.

    Returns offsets [I, tile_height, tile_width] int32; tile t's entries are
    ``sorted[offsets_flat[t] : offsets_flat[t+1]]`` (with n_isects as the
    final bound), identical contract to the reference's
    ``isect_offset_encode`` (IntersectTile.cu:209, oracle
    _torch_impl.py:_isect_offset_encode).

    Implemented as a searchsorted over the sorted keys — sentinel entries
    (INT32_SENTINEL) sort past every valid key so they never shift offsets.
    """
    n_tiles = tile_width * tile_height
    queries = jnp.arange(I * n_tiles, dtype=jnp.int32)
    offsets = jnp.searchsorted(isect_keys, queries, side="left").astype(jnp.int32)
    return offsets.reshape(I, tile_height, tile_width)
