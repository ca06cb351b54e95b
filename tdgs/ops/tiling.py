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
from typing import NamedTuple, Optional, Tuple

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


class IsectPacked(NamedTuple):
    """Packed-key intersection buffers (the fast path)."""

    isect_keys: jnp.ndarray  # [N*K] int32 sorted: tile<<depth_bits | qdepth
    flatten_ids: jnp.ndarray  # [N*K] int32: image*N + gaussian
    offsets: jnp.ndarray  # [I*tile_h*tile_w + 1] int32 per-tile ranges
    n_isects: jnp.ndarray  # [] int32
    n_dropped: jnp.ndarray  # [] int32 (per-gaussian K clamp only)
    depth_bits: int


def isect_tiles_packed(
    means2d: jnp.ndarray,  # [..., N, 2]
    radii: jnp.ndarray,  # [..., N, 2]
    depths: jnp.ndarray,  # [..., N]
    tile_size: int,
    tile_width: int,
    tile_height: int,
    max_tiles_per_gauss: int = 16,
    capacity: Optional[int] = None,
    sort_stable: bool = False,
    exact: bool = False,
    exact_depth: bool = False,
    split_k: Optional[int] = None,
    big_capacity: Optional[int] = None,
) -> IsectPacked:
    """Fast-path tile intersection: one packed int32 key, no scatter.

    Design deltas vs :func:`isect_tiles` (measured on v5e):
    - the (gaussian, tile) expansion is sorted directly at size N·K with
      sentinel keys — a slightly bigger sort instead of the cumsum+scatter
      compaction (sorts are cheap, scatters are not),
    - depth is quantized into the low bits of a single int32 key
      ``(image*n_tiles + tile) << depth_bits | qdepth`` so the sort has one
      key operand (the reference packs exact float bits into 64-bit keys;
      compositing only needs depth *order*, and ties are benign),
    - the sort is unstable by default (the network is still deterministic;
      ties need the same tile AND the same of ~2^18 depth buckets, and
      either order is a valid compositing order) — stable costs +40%,
    - per-tile offsets come from a searchsorted over the sorted keys,
    - ``capacity`` statically truncates the *sorted* buffers (a free slice:
      sentinels sort to the end), so downstream feature gathers touch
      ``capacity`` entries instead of N·K. Real intersections beyond it are
      dropped from the highest tile ids and counted in ``n_dropped``.

    ``exact_depth=True`` sorts on the full f32 depth instead of the
    quantized low key bits: the keys become pure tile ids and the f32
    depth bits ride as a second sort operand (bitcast int32 — a monotone
    map for the positive camera-space depths that survive near-plane
    culling). Costs a 2-key sort; use where compositing order must match
    an exact-depth reference bit-for-bit (golden checks, heavy overdraw).

    ``split_k`` (non-exact mode) enables the **two-population expansion**:
    slots ``[0, split_k)`` are expanded densely for every gaussian, and
    only gaussians covering more than ``split_k`` tiles are compacted
    (``jnp.nonzero`` at static size ``big_capacity``, default G/4) and get
    their ``[split_k, K)`` tail slots, producing the exact same (key, id)
    multiset as the plain capped expansion. Big gaussians beyond
    ``big_capacity`` lose their tail slots (counted in ``n_dropped``).
    Measured caveat (v5e, 200k-gaussian 1080p bench): the pre-sort stream
    does shrink 3.2M→1.7M, but the nonzero compaction + per-big gathers
    cost MORE than the sort saving (48.7→45.1 fps), so this stays
    **opt-in** — profitable only when the tail is far heavier than the
    bench scene's (e.g. trained scenes with K≫16 footprints where the
    dense expansion itself dominates).

    ``exact=True`` switches to the **exact-coverage** expansion — the
    reference's two-pass count/cumsum/write (IntersectTile.cu:95-113) done
    static-shape, with NO per-gaussian tile cap: a splat covering 3000
    tiles gets all 3000 entries (the K-cap renders only the first K tiles
    of the bbox — horizontal-band artifacts on large splats). It costs a
    scatter + cumsum + per-slot decode over [capacity] (~5x the capped
    expansion at bench scale; random access is what TPUs hate), so it is
    opt-in for scenes whose splats outgrow ``max_tiles_per_gauss``. With
    ``exact=True``, ``max_tiles_per_gauss`` only sizes the default
    capacity, and overflow (total demand > capacity) drops the tail in
    gaussian-id order.
    """
    image_dims = means2d.shape[:-2]
    N = means2d.shape[-2]
    I = math.prod(image_dims) if image_dims else 1
    K = max_tiles_per_gauss
    n_tiles = tile_width * tile_height

    tile_bits = max(int(math.ceil(math.log2(max(I * n_tiles, 2)))), 1)
    depth_bits = 0 if exact_depth else 31 - tile_bits
    assert exact_depth or depth_bits >= 8, (
        f"too many tiles ({I * n_tiles}) for packed keys; use isect_tiles"
    )
    # top value reserved: the last tile's max-depth key would otherwise be
    # ((T-1) << depth_bits) | (2^depth_bits - 1) == INT32_SENTINEL and the
    # entry would be dropped as invalid (it composites last in the corner
    # tile — found by the sharded packed-grad parity test)
    depth_levels = max((1 << depth_bits) - 2, 1)

    means2d_f = means2d.reshape(I, N, 2)
    radii_f = radii.reshape(I, N, 2).astype(means2d_f.dtype)
    depths_f = depths.reshape(I, N).astype(jnp.float32)

    tile_means = means2d_f / tile_size
    tile_radii = radii_f / tile_size
    tile_mins = jnp.clip(
        jnp.floor(tile_means - tile_radii).astype(jnp.int32),
        0,
        jnp.array([tile_width, tile_height], dtype=jnp.int32),
    )
    tile_maxs = jnp.clip(
        jnp.ceil(tile_means + tile_radii).astype(jnp.int32),
        0,
        jnp.array([tile_width, tile_height], dtype=jnp.int32),
    )
    w_g = tile_maxs[..., 0] - tile_mins[..., 0]
    h_g = tile_maxs[..., 1] - tile_mins[..., 1]
    alive = (radii_f > 0.0).all(axis=-1)
    tiles_full = jnp.where(alive, w_g * h_g, 0)

    # depth quantization over the live range
    dmin = jnp.min(jnp.where(alive, depths_f, jnp.inf))
    dmax = jnp.max(jnp.where(alive, depths_f, -jnp.inf))
    dspan = jnp.maximum(dmax - dmin, 1e-12)
    # clip AFTER the int cast: depth_levels (2^k−1) is not representable in
    # f32, so the float clip can round up to 2^k and overflow into tile bits
    qdepth = jnp.clip(
        ((depths_f - dmin) / dspan * depth_levels).astype(jnp.int32),
        0,
        depth_levels,
    )  # [I, N]
    if exact_depth:
        qdepth = jnp.zeros_like(qdepth)  # depth rides as a 2nd sort key
        depth_i32 = jax.lax.bitcast_convert_type(depths_f, jnp.int32)

    if exact:
        # ---- exact variable-count expansion into a static [capacity]
        # buffer. counts→cumsum gives each gaussian its slot range; ONE
        # 4-column delta-scatter at every range start + ONE inclusive
        # cumsum delivers (owner, range start, first-tile key, bbox width)
        # to every slot — per-slot attribute GATHERS from the [G] tables
        # cost ~26 ms each at this scale, the delta-scatter route ~2 ops
        # total. Duplicate starts from zero-count gaussians are benign:
        # their deltas stack and the cumsum lands on the true owner.
        # NB totals are int32 — fine to ~2.1e9 demanded intersections
        # (x64 is disabled on TPU); int32 cumsum of deltas reconstructs
        # values exactly under two's-complement wraparound.
        if capacity is None:
            capacity = I * N * K
        capacity = -(-capacity // 128) * 128  # chunk-align for the kernels
        counts = tiles_full.reshape(-1)  # [G] = [I*N]
        cum = jnp.cumsum(counts)
        total = cum[-1]
        starts = cum - counts  # exclusive prefix
        mins_f = tile_mins.reshape(-1, 2)
        g_ids = jnp.arange(counts.shape[0], dtype=jnp.int32)
        first_tile = (g_ids // N) * n_tiles + mins_f[:, 1] * tile_width + mins_f[:, 0]
        base_key = (first_tile << depth_bits) | qdepth.reshape(-1)
        cols = [
            g_ids,  # owner id
            starts,
            base_key,
            w_g.reshape(-1),
        ]
        if exact_depth:
            cols.append(depth_i32.reshape(-1))
        vals = jnp.stack(cols, axis=-1)  # [G, 4 or 5]
        deltas = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]], axis=0)
        acc = (
            jnp.zeros((capacity, len(cols)), jnp.int32)
            .at[starts]
            .add(deltas, mode="drop")
        )
        acc = jnp.cumsum(acc, axis=0)  # step-function reconstruction
        slot = jnp.arange(capacity, dtype=jnp.int32)
        valid = slot < jnp.minimum(total, capacity)
        owner = jnp.clip(acc[:, 0], 0, counts.shape[0] - 1)
        k_in = slot - acc[:, 1]  # row-major rank inside the owner's bbox
        w_o = jnp.maximum(acc[:, 3], 1)
        dy = k_in // w_o
        dx = k_in - dy * w_o
        keys = acc[:, 2] + ((dy * tile_width + dx) << depth_bits)
        keys = jnp.where(valid, keys, INT32_SENTINEL)

        if exact_depth:
            keys_s, _, fids_s = jax.lax.sort(
                (keys, acc[:, 4], owner), num_keys=2, is_stable=sort_stable
            )
        else:
            keys_s, fids_s = jax.lax.sort(
                (keys, owner), num_keys=1, is_stable=sort_stable
            )  # owner == image_id * N + gaussian_id == flatten id
        n_isects = jnp.minimum(total, capacity).astype(jnp.int32)
        n_dropped = jnp.maximum(total - capacity, 0).astype(jnp.int32)
        return IsectPacked(
            isect_keys=keys_s,
            flatten_ids=fids_s,
            offsets=_packed_offsets(keys_s, I, n_tiles, depth_bits),
            n_isects=n_isects,
            n_dropped=n_dropped,
            depth_bits=depth_bits,
        )

    tiles_capped = jnp.minimum(tiles_full, K)
    img_ids = jnp.arange(I, dtype=jnp.int32)[:, None, None]

    def expand(k_lo: int, k_hi: int):
        """Dense (gaussian, k)-slot expansion for slots k_lo..k_hi."""
        k_idx = jnp.arange(k_lo, k_hi, dtype=jnp.int32)[None, None, :]
        w_safe = jnp.maximum(w_g, 1)[..., None]
        dy = k_idx // w_safe
        dx = k_idx % w_safe
        tile_id = (
            (tile_mins[..., 1:2] + dy) * tile_width + tile_mins[..., 0:1] + dx
        )
        keys = ((img_ids * n_tiles + tile_id) << depth_bits) | qdepth[..., None]
        valid_k = k_idx < tiles_capped[..., None]
        keys = jnp.where(valid_k, keys, INT32_SENTINEL)
        fids = jnp.broadcast_to(
            img_ids * N + jnp.arange(N, dtype=jnp.int32)[None, :, None],
            (I, N, k_hi - k_lo),
        )
        return keys.reshape(-1), fids.reshape(-1)

    if split_k is not None and 0 < split_k < K:
        # ---- two-population expansion: the sort is the tiling stage's
        # dominant cost and scales with N*K slots, but coverage is heavy-
        # tailed (bench scene: 82% of gaussians fit in 6 tiles while K=16
        # sizes for the outliers). Expand slots [0, split_k) densely for
        # every gaussian, then COMPACT the few gaussians needing more and
        # expand only their [split_k, K) tail — at bench scale the sorted
        # stream shrinks 3.2M -> 1.7M entries.
        K1 = split_k
        G = I * N
        if big_capacity is None:
            big_capacity = G // 4
        B = max(-(-big_capacity // 128) * 128, 128)
        keys1, fids1 = expand(0, K1)

        is_big = tiles_full.reshape(-1) > K1  # [G]
        n_big = jnp.sum(is_big).astype(jnp.int32)
        big_idx = jnp.nonzero(is_big, size=B, fill_value=G)[0].astype(jnp.int32)
        valid_b = big_idx < G
        bidx = jnp.minimum(big_idx, G - 1)
        tmin_b = tile_mins.reshape(G, 2)[bidx]  # [B, 2]
        w_b = jnp.maximum(w_g.reshape(-1)[bidx], 1)[:, None]
        tc_b = tiles_capped.reshape(-1)[bidx]
        q_b = qdepth.reshape(-1)[bidx]
        img_b = bidx // N
        k2 = jnp.arange(K1, K, dtype=jnp.int32)[None, :]  # [1, K-K1]
        dy = k2 // w_b
        dx = k2 % w_b
        tile_id = (tmin_b[:, 1:2] + dy) * tile_width + tmin_b[:, 0:1] + dx
        keys2 = ((img_b[:, None] * n_tiles + tile_id) << depth_bits) | q_b[:, None]
        valid2 = valid_b[:, None] & (k2 < tc_b[:, None])
        keys2 = jnp.where(valid2, keys2, INT32_SENTINEL)
        fids2 = jnp.broadcast_to(bidx[:, None], keys2.shape)  # flat id == img*N+g

        keys_flat = jnp.concatenate([keys1, keys2.reshape(-1)])
        fids_flat = jnp.concatenate([fids1, fids2.reshape(-1)])
        if exact_depth:
            dep_flat = jnp.concatenate([
                jnp.broadcast_to(depth_i32[..., None], (I, N, K1)).reshape(-1),
                jnp.broadcast_to(
                    depth_i32.reshape(-1)[bidx][:, None], keys2.shape
                ).reshape(-1),
            ])
        # entries actually emitted (big gaussians beyond B lose their tail)
        n_isects = (
            jnp.sum(jnp.minimum(tiles_capped, K1))
            + jnp.sum(jnp.where(valid_b, tc_b - K1, 0))
        ).astype(jnp.int32)
        n_dropped = (jnp.sum(tiles_full) - n_isects).astype(jnp.int32)
    else:
        keys_flat, fids_flat = expand(0, K)
        if exact_depth:
            dep_flat = jnp.broadcast_to(
                depth_i32[..., None], (I, N, K)
            ).reshape(-1)
        n_isects = jnp.sum(tiles_capped).astype(jnp.int32)
        n_dropped = jnp.sum(tiles_full - tiles_capped).astype(jnp.int32)

    if exact_depth:
        keys_s, _, fids_s = jax.lax.sort(
            (keys_flat, dep_flat, fids_flat), num_keys=2, is_stable=sort_stable
        )
    else:
        keys_s, fids_s = jax.lax.sort(
            (keys_flat, fids_flat), num_keys=1, is_stable=sort_stable
        )

    if capacity is not None and capacity < keys_s.shape[0]:
        # Static truncation of the sorted buffers: sentinel (invalid) slots
        # are at the end, so this only drops real entries on overflow.
        capacity = -(-capacity // 128) * 128  # chunk-align for the kernels
        keys_s = keys_s[:capacity]
        fids_s = fids_s[:capacity]
        n_dropped = n_dropped + jnp.maximum(n_isects - capacity, 0)
        n_isects = jnp.minimum(n_isects, capacity)

    return IsectPacked(
        isect_keys=keys_s,
        flatten_ids=fids_s,
        offsets=_packed_offsets(keys_s, I, n_tiles, depth_bits),
        n_isects=n_isects,
        n_dropped=n_dropped,
        depth_bits=depth_bits,
    )


def count_isects(
    means2d: jnp.ndarray,  # [..., N, 2]
    radii: jnp.ndarray,  # [..., N, 2]
    tile_size: int,
    tile_width: int,
    tile_height: int,
    max_tiles_per_gauss: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(capped_total, full_total) tile-intersection counts for a projected
    scene — the cheap pre-pass behind :func:`derive_isect_capacity`. Uses
    the same AABB→tile-range math as ``isect_tiles_packed``; ``capped``
    applies the per-gaussian ``max_tiles_per_gauss`` clamp (None = exact
    coverage)."""
    N = means2d.shape[-2]
    I = math.prod(means2d.shape[:-2]) if means2d.shape[:-2] else 1
    means2d_f = means2d.reshape(I, N, 2)
    radii_f = radii.reshape(I, N, 2).astype(means2d_f.dtype)
    tile_means = means2d_f / tile_size
    tile_radii = radii_f / tile_size
    lim = jnp.array([tile_width, tile_height], dtype=jnp.int32)
    tile_mins = jnp.clip(
        jnp.floor(tile_means - tile_radii).astype(jnp.int32), 0, lim
    )
    tile_maxs = jnp.clip(
        jnp.ceil(tile_means + tile_radii).astype(jnp.int32), 0, lim
    )
    w_g = tile_maxs[..., 0] - tile_mins[..., 0]
    h_g = tile_maxs[..., 1] - tile_mins[..., 1]
    alive = (radii_f > 0.0).all(axis=-1)
    tiles_full = jnp.where(alive, w_g * h_g, 0)
    full = jnp.sum(tiles_full)
    if max_tiles_per_gauss is None:
        return full, full
    return jnp.sum(jnp.minimum(tiles_full, max_tiles_per_gauss)), full


def derive_isect_capacity(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    viewmats: jnp.ndarray,
    Ks: jnp.ndarray,
    width: int,
    height: int,
    tile_size: int = 16,
    max_tiles_per_gauss: Optional[int] = 16,
    headroom: float = 1.1,
    **proj_kwargs,
) -> int:
    """Auto-size ``isect_capacity`` for a scene: one jitted projection +
    footprint count, then ``headroom``x margin rounded up to a 4096-entry
    boundary. Replaces hand-tuned per-scene capacities (the capacity
    directly buys fps — the post-sort feature gather is row-count bound —
    so an honest tight bound beats a safe guess).

    The 4096 rounding coarsens shape churn (fewer recompiles across
    nearby scene sizes) at ≤0.4% waste at 1M entries. It is NOT a
    performance rule: the eval3d stride cliff this round uncovered
    (BENCH_BREAKDOWN_r04.md "Resolution" — capacities below
    T_total·CHUNK run ~12% slower regardless of alignment) is handled
    inside the eval3d wrappers by padding the packed stream's minor
    dim across the cliff, so the derived capacity here stays an honest
    tight bound for the sort/gather.

    Host-synchronizing (returns a Python int): call once per scene/shape,
    not inside a jitted step."""
    from tdgs.ops.projection import fully_fused_projection

    tile_width = math.ceil(width / tile_size)
    tile_height = math.ceil(height / tile_size)

    @jax.jit
    def count(means, quats, scales, opacities, viewmats, Ks):
        radii, means2d, _, _, _ = fully_fused_projection(
            means, quats, scales, viewmats, Ks, width, height,
            opacities=opacities, **proj_kwargs,
        )
        return count_isects(
            means2d, radii, tile_size, tile_width, tile_height,
            max_tiles_per_gauss=max_tiles_per_gauss,
        )

    import numpy as _np

    capped, _ = count(means, quats, scales, opacities, viewmats, Ks)
    n = int(_np.asarray(capped))
    return max(-(-int(n * headroom) // 4096) * 4096, 4096)


def derive_isect_plan(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    viewmats: jnp.ndarray,
    Ks: jnp.ndarray,
    width: int,
    height: int,
    tile_size: int = 16,
    max_tiles_per_gauss: int = 32,
    headroom: float = 1.1,
    big_budget: int = 8192,
    dense_factor: int = 3,
    **proj_kwargs,
) -> dict:
    """Host-side auto-policy for the packed tiling expansion: derive
    ``{isect_capacity, max_tiles_per_gauss, isect_split_k,
    isect_big_capacity}`` from the scene's actual footprint histogram.

    Motivation (measured, v5e, 1080p trained-density scenes): the
    capped dense expansion sorts N*K rows — 16M at 1M gaussians, ~50 ms
    of an 86 ms frame — while 99.4% of splats cover <=4 tiles there; the
    exact two-pass mode dodges the big sort but its [G]-row delta
    scatter costs just as much (TPU scatters serialize). The two-
    population ``split_k`` expansion (dense k1 slots for everyone +
    compacted tails for the few big splats) wins ONLY when sized
    tightly: split_k=4/big_capacity=8k cut the 1M tiling stage
    50.3 -> 24.0 ms, while the same mode with a G/4 big_capacity was a
    round-2 negative result, and at 200k dense-16 is already 9.7 ms
    (split overhead loses). Hence a derived per-scene plan:

    - K := min(max observed tiles-per-gaussian, ``max_tiles_per_gauss``)
      (coverage identical to a capped expansion at that K),
    - the smallest k1 whose big-splat count fits ``big_budget`` is
      adopted only when the dense N*K row count exceeds the split row
      count by the measured ~1.5x compaction-overhead breakeven
      (``dense_factor``/2); otherwise plain dense.

    Host-synchronizing (one jitted projection + count pass); call once
    per scene/shape like :func:`derive_isect_capacity`."""
    from tdgs.ops.projection import fully_fused_projection

    tile_width = math.ceil(width / tile_size)
    tile_height = math.ceil(height / tile_size)
    candidates = (2, 3, 4, 6, 8, 12, 16, 24)

    @jax.jit
    def stats(means, quats, scales, opacities, viewmats, Ks):
        radii, means2d, _, _, _ = fully_fused_projection(
            means, quats, scales, viewmats, Ks, width, height,
            opacities=opacities, **proj_kwargs,
        )
        N = means2d.shape[-2]
        I = math.prod(means2d.shape[:-2]) if means2d.shape[:-2] else 1
        m2 = means2d.reshape(I, N, 2) / tile_size
        rad = radii.reshape(I, N, 2).astype(means2d.dtype) / tile_size
        lim = jnp.array([tile_width, tile_height], dtype=jnp.int32)
        tmin = jnp.clip(jnp.floor(m2 - rad).astype(jnp.int32), 0, lim)
        tmax = jnp.clip(jnp.ceil(m2 + rad).astype(jnp.int32), 0, lim)
        alive = (rad > 0.0).all(axis=-1)
        tiles = jnp.where(
            alive,
            (tmax[..., 0] - tmin[..., 0]) * (tmax[..., 1] - tmin[..., 1]),
            0,
        ).reshape(-1)
        kmax = jnp.max(tiles)
        n_big = jnp.stack([jnp.sum(tiles > k) for k in candidates])
        cap_total = jnp.sum(jnp.minimum(tiles, max_tiles_per_gauss))
        full_total = jnp.sum(tiles)
        return cap_total, full_total, kmax, n_big

    import numpy as _np

    cap_total, full_total, kmax, n_big = jax.tree.map(
        _np.asarray, stats(means, quats, scales, opacities, viewmats, Ks)
    )
    G = int(means.shape[-2]) * (
        math.prod(viewmats.shape[:-2]) if viewmats.shape[:-2] else 1
    )
    capacity = max(-(-int(int(cap_total) * headroom) // 4096) * 4096, 4096)
    K = int(min(int(kmax), max_tiles_per_gauss))
    K = max(K, 1)
    # footprint_kmax is diagnostic, NOT a rasterization kwarg: when it
    # exceeds max_tiles_per_gauss the plan's coverage is CLIPPED (first-K-
    # tiles banding on the biggest splats) — callers needing full coverage
    # must pop it and fall back to isect_exact (measured: a 16-domino
    # trained scene carried splats covering >64 tiles; the clipped plan
    # dropped the reference-chain golden from 66 to 27 dB)
    plan = {
        "isect_capacity": capacity,
        "max_tiles_per_gauss": K,
        "isect_split_k": None,
        "isect_big_capacity": None,
        "footprint_kmax": int(kmax),
        "full_isect_demand": int(full_total),
    }
    # pick split only where it shrinks the sorted row count enough to pay
    # for its compaction overhead (measured ~1.6x breakeven: at 200k dense
    # sorts 3.2M rows in 9.7 ms while split_k=12 costs 10.2 ms on 2.4M)
    dense_rows = G * K
    for k1, nb in zip(candidates, n_big):
        if k1 >= K:
            break
        if int(nb) <= big_budget:
            bigcap = max(-(-int(int(nb) * 2 + 256) // 128) * 128, 1024)
            split_rows = G * k1 + bigcap * (K - k1)
            if dense_rows > dense_factor / 2.0 * split_rows:
                plan["isect_split_k"] = int(k1)
                plan["isect_big_capacity"] = bigcap
            break
    return plan


def _packed_offsets(keys_s, I: int, n_tiles: int, depth_bits: int):
    """Per-tile start offsets into the sorted packed-key buffer."""
    # boundaries computed host-side in int64 (x64 is disabled on device)
    import numpy as _np

    boundaries = jnp.asarray(
        _np.minimum(
            _np.arange(I * n_tiles + 1, dtype=_np.int64) << depth_bits,
            int(INT32_SENTINEL),
        ).astype(_np.int32)
    )
    # NB: a two-level sampled searchsorted measures faster standalone but
    # is ~9x slower when fused into this program (strided-slice + 2-D window
    # gather lower badly on TPU); the direct binary search fuses to ~1 ms.
    return jnp.searchsorted(keys_s, boundaries, side="left").astype(jnp.int32)


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
