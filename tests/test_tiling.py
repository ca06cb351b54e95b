import numpy as np
import jax.numpy as jnp
import pytest

from tdgs.ops import tiling
from tests import oracles


def make_projected(rng, I=2, N=64, width=64, height=48, tile_size=16):
    tile_width = -(-width // tile_size)
    tile_height = -(-height // tile_size)
    means2d = rng.uniform(-10, max(width, height) + 10, size=(I, N, 2)).astype(
        np.float32
    )
    radii = rng.integers(0, 12, size=(I, N, 2)).astype(np.int32)
    # make some invalid
    radii[rng.random(size=(I, N)) < 0.2] = 0
    depths = rng.uniform(0.1, 10.0, size=(I, N)).astype(np.float32)
    return means2d, radii, depths, tile_width, tile_height


def test_isect_tiles_matches_bruteforce():
    rng = np.random.default_rng(21)
    means2d, radii, depths, tw, th = make_projected(rng)
    tile_size = 16
    entries = oracles.isect_tiles_np(means2d, radii, depths, tile_size, tw, th)
    capacity = len(entries) + 17  # odd slack

    res = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=capacity, max_tiles_per_gauss=64,
    )
    n = int(res.n_isects)
    assert n == len(entries)
    assert int(res.n_dropped) == 0

    got_keys = np.asarray(res.isect_keys)[:n]
    got_deps = np.asarray(res.isect_depths)[:n]
    got_fids = np.asarray(res.flatten_ids)[:n]
    want_keys = np.array([e[0] for e in entries])
    want_deps = np.array([e[1] for e in entries])
    want_fids = np.array([e[2] for e in entries])
    np.testing.assert_array_equal(got_keys, want_keys)
    np.testing.assert_allclose(got_deps, want_deps, rtol=1e-6)
    np.testing.assert_array_equal(got_fids, want_fids)

    # sentinel tail
    assert np.all(np.asarray(res.isect_keys)[n:] == tiling.INT32_SENTINEL)

    # tiles_per_gauss parity
    per_gauss = np.zeros((means2d.shape[0], means2d.shape[1]), dtype=np.int64)
    N = means2d.shape[1]
    for _, _, fid in entries:
        per_gauss[fid // N, fid % N] += 1
    np.testing.assert_array_equal(np.asarray(res.tiles_per_gauss), per_gauss)


def test_isect_offsets_match_ranges():
    rng = np.random.default_rng(22)
    means2d, radii, depths, tw, th = make_projected(rng, I=3)
    tile_size = 16
    entries = oracles.isect_tiles_np(means2d, radii, depths, tile_size, tw, th)
    capacity = len(entries) + 5

    res = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=capacity, max_tiles_per_gauss=64,
    )
    offsets = np.asarray(tiling.isect_offset_encode(res.isect_keys, 3, tw, th))
    assert offsets.shape == (3, th, tw)

    keys = np.array([e[0] for e in entries])
    for i in range(3):
        for ty in range(th):
            for tx in range(tw):
                key = i * tw * th + ty * tw + tx
                want_start = int(np.searchsorted(keys, key, side="left"))
                assert offsets[i, ty, tx] == want_start


def test_capacity_overflow_drops_and_counts():
    rng = np.random.default_rng(23)
    means2d, radii, depths, tw, th = make_projected(rng)
    tile_size = 16
    entries = oracles.isect_tiles_np(means2d, radii, depths, tile_size, tw, th)
    capacity = max(len(entries) // 2, 1)

    res = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=capacity, max_tiles_per_gauss=64,
    )
    assert int(res.n_isects) == capacity
    assert int(res.n_dropped) == len(entries) - capacity
    # entries present must be a subset (prefix order of the pre-sort
    # enumeration), all valid keys
    got_keys = np.asarray(res.isect_keys)
    assert (got_keys != tiling.INT32_SENTINEL).sum() == capacity


def test_max_tiles_per_gauss_clamp():
    # one huge gaussian covering everything
    tile_size = 16
    tw, th = 8, 8
    means2d = np.array([[[64.0, 64.0]]], dtype=np.float32)
    radii = np.array([[[1000, 1000]]], dtype=np.int32)
    depths = np.array([[1.0]], dtype=np.float32)
    res = tiling.isect_tiles(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, capacity=128, max_tiles_per_gauss=16,
    )
    assert int(res.tiles_per_gauss[0, 0]) == 64  # true count
    assert int(res.n_isects) == 16  # capped
    assert int(res.n_dropped) == 48


def test_isect_tiles_packed_capacity_truncation():
    rng = np.random.default_rng(3)
    n = 64
    tw = th = 8
    tile_size = 16
    means2d = rng.uniform(0, 128, size=(1, n, 2)).astype(np.float32)
    radii = rng.integers(8, 40, size=(1, n, 2)).astype(np.int32)
    depths = rng.uniform(1, 10, size=(1, n)).astype(np.float32)

    full = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, max_tiles_per_gauss=16,
    )
    n_real = int(full.n_isects)
    assert n_real > 256

    cap = 256  # multiple of 128, below n_real → must truncate + count drops
    trunc = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, max_tiles_per_gauss=16, capacity=cap,
    )
    assert trunc.isect_keys.shape == (cap,)
    assert int(trunc.n_isects) == cap
    assert int(trunc.n_dropped) == int(full.n_dropped) + (n_real - cap)
    # kept entries are the expansion's first `cap` slots in gaussian-id
    # order (the exact-coverage design truncates pre-sort): every kept key
    # must appear in the full result, with multiplicity
    full_keys = np.asarray(full.isect_keys)[: n_real]
    kept = np.asarray(trunc.isect_keys)
    fu, fc = np.unique(full_keys, return_counts=True)
    ku, kc = np.unique(kept, return_counts=True)
    pos = np.searchsorted(fu, ku)
    assert (pos < fu.size).all() and (fu[pos] == ku).all()
    assert (kc <= fc[pos]).all()  # kept multiset ⊆ full multiset
    # offsets stay within the truncated buffer and consistent with keys
    offs = np.asarray(trunc.offsets)
    assert offs[-1] <= cap
    assert (np.diff(offs) >= 0).all()

    # a capacity above n_isects changes nothing but the buffer length
    roomy = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, max_tiles_per_gauss=16,
        capacity=-(-n_real // 128) * 128 + 128,
    )
    assert int(roomy.n_dropped) == int(full.n_dropped)
    np.testing.assert_array_equal(np.asarray(roomy.offsets), np.asarray(full.offsets))


def test_isect_tiles_packed_exact_coverage_large_splat():
    """A splat covering many more tiles than the legacy max_tiles_per_gauss
    must get ALL its tiles (the old per-gaussian cap rendered only the first
    K tiles of the bbox — horizontal-band artifacts on large splats)."""
    tw = th = 16
    tile_size = 16
    # one huge splat centred on the 256x256 image, radius covers everything
    means2d = np.array([[[128.0, 128.0]]], np.float32)
    radii = np.array([[[300, 300]]], np.int32)
    depths = np.array([[2.0]], np.float32)
    out = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, max_tiles_per_gauss=16, capacity=512, exact=True,
    )
    assert int(out.n_isects) == tw * th  # all 256 tiles covered
    assert int(out.n_dropped) == 0
    offs = np.asarray(out.offsets)
    # every tile's range contains exactly one entry
    assert (np.diff(offs)[: tw * th] == 1).all()


def test_isect_tiles_packed_exact_matches_capped_when_small():
    """With no gaussian over the K cap, exact=True and the capped expansion
    must produce identical sorted buffers (same keys/fids multisets and the
    same offsets)."""
    rng = np.random.default_rng(9)
    n = 96
    tw, th = 6, 5
    tile_size = 16
    means2d = rng.uniform(0, 90, size=(2, n, 2)).astype(np.float32)
    radii = rng.integers(0, 10, size=(2, n, 2)).astype(np.int32)
    depths = rng.uniform(1, 9, size=(2, n)).astype(np.float32)
    kw = dict(max_tiles_per_gauss=16, capacity=2048, sort_stable=True)
    a = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, **kw)
    b = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, exact=True, **kw)
    assert int(a.n_dropped) == 0 and int(b.n_dropped) == 0
    assert int(a.n_isects) == int(b.n_isects)
    n_real = int(a.n_isects)
    np.testing.assert_array_equal(
        np.asarray(a.isect_keys)[:n_real], np.asarray(b.isect_keys)[:n_real])
    np.testing.assert_array_equal(
        np.asarray(a.flatten_ids)[:n_real], np.asarray(b.flatten_ids)[:n_real])
    np.testing.assert_array_equal(np.asarray(a.offsets), np.asarray(b.offsets))


def test_isect_tiles_packed_exact_depth_order():
    """exact_depth=True must order entries inside each tile by true f32
    depth (the quantized single-key mode buckets depths to depth_bits
    levels; two nearby depths can swap)."""
    tile_size = 16
    tw = th = 2
    n = 40
    rng = np.random.default_rng(11)
    means2d = rng.uniform(0, 32, size=(1, n, 2)).astype(np.float32)
    radii = np.full((1, n, 2), 4, np.int32)
    # adversarial depths: tiny increments that quantization buckets merge
    depths = (2.0 + np.arange(n, dtype=np.float32) * 1e-7)[None]
    perm = rng.permutation(n)
    depths = depths[:, perm]

    for exact in (False, True):
        res = tiling.isect_tiles_packed(
            jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
            tile_size, tw, th, max_tiles_per_gauss=8, capacity=512,
            exact=exact, exact_depth=True,
        )
        n_real = int(res.n_isects)
        keys = np.asarray(res.isect_keys)[:n_real]
        fids = np.asarray(res.flatten_ids)[:n_real]
        d = depths[0][fids]
        # within every tile-key run, depths must be non-decreasing
        for k in np.unique(keys):
            dk = d[keys == k]
            assert (np.diff(dk) >= 0).all(), (exact, k, dk)


def test_isect_tiles_packed_split_matches_plain():
    """The two-population expansion (split_k) must produce the exact same
    sorted (key, fid) multiset as the plain capped expansion."""
    rng = np.random.default_rng(33)
    means2d, radii, depths, tw, th = make_projected(rng, I=2, N=96)
    tile_size = 16

    plain = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        tile_size, tw, th, max_tiles_per_gauss=16, capacity=4096,
    )
    for big_cap in (256, None):  # generous and default (G/4, rounds to 128)
        split = tiling.isect_tiles_packed(
            jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
            tile_size, tw, th, max_tiles_per_gauss=16, capacity=4096,
            split_k=3, big_capacity=big_cap,
        )
        n = int(plain.n_isects)
        assert int(split.n_isects) == n
        assert int(split.n_dropped) == int(plain.n_dropped)
        a = np.stack([np.asarray(plain.isect_keys)[:n],
                      np.asarray(plain.flatten_ids)[:n]], -1)
        b = np.stack([np.asarray(split.isect_keys)[:n],
                      np.asarray(split.flatten_ids)[:n]], -1)
        a = a[np.lexsort((a[:, 1], a[:, 0]))]
        b = b[np.lexsort((b[:, 1], b[:, 0]))]
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(
            np.asarray(plain.offsets), np.asarray(split.offsets))


def test_isect_tiles_packed_split_big_overflow_counts_drops():
    """Big gaussians beyond big_capacity lose their tail tiles, and the
    loss is reported in n_dropped."""
    rng = np.random.default_rng(34)
    n = 200  # > the 128-rounded big_capacity floor, so 72 lose their tail
    means2d = rng.uniform(10, 50, size=(1, n, 2)).astype(np.float32)
    radii = np.full((1, n, 2), 20, np.int32)  # everyone covers many tiles
    depths = rng.uniform(0.5, 5.0, size=(1, n)).astype(np.float32)
    tw = th = 4
    kw = dict(max_tiles_per_gauss=16, capacity=8192)
    plain = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        16, tw, th, **kw)
    split = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        16, tw, th, split_k=2, big_capacity=1, **kw)  # B rounds up to 128
    # numpy replica of the (clipped, K-capped) per-gaussian tile counts
    tmin = np.clip(np.floor((means2d[0] - 20) / 16).astype(int), 0, [tw, th])
    tmax = np.clip(np.ceil((means2d[0] + 20) / 16).astype(int), 0, [tw, th])
    tiles = np.minimum(
        (tmax[:, 0] - tmin[:, 0]) * (tmax[:, 1] - tmin[:, 1]), 16)
    big = tiles > 2  # the first 128 big ones keep their tail, the rest lose it
    kept = np.where(big, np.where(np.cumsum(big) <= 128, tiles, 2), tiles)
    assert int(plain.n_isects) == tiles.sum() and int(plain.n_dropped) == 0
    assert big.sum() > 128  # the overflow case is actually exercised
    assert int(split.n_isects) == kept.sum()
    assert int(split.n_dropped) == tiles.sum() - kept.sum() > 0
    # the emitted entries are a subset of the plain ones
    a = {(int(k), int(f)) for k, f in zip(
        np.asarray(plain.isect_keys)[: int(plain.n_isects)],
        np.asarray(plain.flatten_ids)[: int(plain.n_isects)])}
    b = [(int(k), int(f)) for k, f in zip(
        np.asarray(split.isect_keys)[: int(split.n_isects)],
        np.asarray(split.flatten_ids)[: int(split.n_isects)])]
    assert set(b) <= a and len(b) == int(split.n_isects)


@pytest.mark.slow
def test_isect_tiles_packed_split_exact_depth():
    """split_k composes with exact_depth (full-f32 in-tile depth order)."""
    rng = np.random.default_rng(35)
    means2d, radii, depths, tw, th = make_projected(rng, I=1, N=80)
    a = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        16, tw, th, max_tiles_per_gauss=16, capacity=4096, exact_depth=True,
    )
    b = tiling.isect_tiles_packed(
        jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
        16, tw, th, max_tiles_per_gauss=16, capacity=4096, exact_depth=True,
        split_k=4,
    )
    n = int(a.n_isects)
    assert int(b.n_isects) == n
    np.testing.assert_array_equal(
        np.asarray(a.isect_keys)[:n], np.asarray(b.isect_keys)[:n])
    np.testing.assert_array_equal(
        np.asarray(a.flatten_ids)[:n], np.asarray(b.flatten_ids)[:n])


def test_derive_isect_capacity_rounding_and_sufficiency():
    """derive_isect_capacity: 4096-aligned (the measured stride rule,
    BENCH_BREAKDOWN_r04.md), >= the actual capped need, floor 4096."""
    rng = np.random.default_rng(7)
    N = 300
    means = rng.normal(size=(N, 3)).astype(np.float32) + [0, 0, 6.0]
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    scales = rng.uniform(0.01, 0.08, size=(N, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 1.0, size=(N,)).astype(np.float32)
    viewmats = np.eye(4, dtype=np.float32)[None]
    Ks = np.array([[[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]]], np.float32)
    cap = tiling.derive_isect_capacity(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(viewmats), jnp.asarray(Ks),
        64, 48, max_tiles_per_gauss=16,
    )
    assert cap % 4096 == 0 and cap >= 4096
    # sufficiency: tiling at the derived capacity drops nothing beyond
    # the per-gaussian clamp (n_dropped counts capacity overflow)
    from tdgs.ops.projection import fully_fused_projection

    radii, means2d, depths, _, _ = fully_fused_projection(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(viewmats), jnp.asarray(Ks), 64, 48,
        opacities=jnp.asarray(opac),
    )
    isect = tiling.isect_tiles_packed(
        means2d, radii, depths, 16, 4, 3,
        max_tiles_per_gauss=16, capacity=int(cap),
    )
    assert int(isect.n_dropped) == 0
    assert int(isect.n_isects) <= cap


def test_derive_isect_plan_matches_dense_coverage():
    """derive_isect_plan's expansion (dense or split) must produce the
    same intersection multiset as the plain capped expansion at the
    plan's K (the policy only changes HOW rows are emitted, never which;
    measured v5e: split plan cut the 1M tiling stage 50->24 ms)."""
    import jax.numpy as jnp

    from tdgs.ops.tiling import derive_isect_plan, isect_tiles_packed

    rng = np.random.default_rng(5)
    N = 512
    means = rng.normal(size=(N, 3)).astype(np.float32) * 0.5 + [0, 0, 4.0]
    quats = np.tile([1.0, 0, 0, 0], (N, 1)).astype(np.float32)
    # heavy-tailed footprints: a few big splats force a split-eligible
    # histogram
    scales = np.full((N, 3), 0.01, np.float32)
    scales[:8] = 0.4
    opac = np.full((N,), 0.9, np.float32)
    vm = np.eye(4, dtype=np.float32)
    K = np.array([[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]], np.float32)
    W, H = 64, 48
    plan = derive_isect_plan(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(vm)[None], jnp.asarray(K)[None],
        W, H, big_budget=64, dense_factor=0,  # force split when feasible
    )
    assert plan["isect_capacity"] >= 4096
    assert plan["max_tiles_per_gauss"] >= 1

    from tdgs.ops.projection import fully_fused_projection

    radii, means2d, depths, _, _ = fully_fused_projection(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(vm)[None], jnp.asarray(K)[None], W, H,
        opacities=jnp.asarray(opac),
    )
    tw, th = -(-W // 16), -(-H // 16)
    kw = dict(capacity=plan["isect_capacity"],
              max_tiles_per_gauss=plan["max_tiles_per_gauss"])
    ref = isect_tiles_packed(means2d, radii, depths, 16, tw, th, **kw)
    got = isect_tiles_packed(
        means2d, radii, depths, 16, tw, th,
        split_k=plan["isect_split_k"],
        big_capacity=plan["isect_big_capacity"], **kw,
    )
    n = int(ref.n_isects)
    assert int(got.n_isects) == n
    # same multiset of (key, id) pairs regardless of emission route
    ref_pairs = np.sort(
        np.asarray(ref.isect_keys[:n]).astype(np.int64) * (1 << 32)
        + np.asarray(ref.flatten_ids[:n])
    )
    got_pairs = np.sort(
        np.asarray(got.isect_keys[:n]).astype(np.int64) * (1 << 32)
        + np.asarray(got.flatten_ids[:n])
    )
    np.testing.assert_array_equal(ref_pairs, got_pairs)


def test_derive_isect_plan_small_scene_stays_dense():
    import jax.numpy as jnp

    from tdgs.ops.tiling import derive_isect_plan

    rng = np.random.default_rng(6)
    N = 64
    means = rng.normal(size=(N, 3)).astype(np.float32) * 0.3 + [0, 0, 4.0]
    quats = np.tile([1.0, 0, 0, 0], (N, 1)).astype(np.float32)
    scales = np.full((N, 3), 0.02, np.float32)
    opac = np.full((N,), 0.9, np.float32)
    vm = np.eye(4, dtype=np.float32)
    K = np.array([[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]], np.float32)
    plan = derive_isect_plan(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(vm)[None], jnp.asarray(K)[None],
        64, 48,
    )
    assert plan["isect_split_k"] is None
