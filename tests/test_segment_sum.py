"""Sorted-segment-sum kernel + gather VJP (tdgs/ops/segment_sum_pallas)."""
import jax
import jax.numpy as jnp
import numpy as np

from tdgs.ops.segment_sum_pallas import (
    BLK,
    ENT,
    gather_rows_segsum,
    sorted_segment_rows_sum,
)
CHUNK = ENT


def _ref_segsum(rows, sids, n_rows):
    out = np.zeros((rows.shape[0], n_rows), np.float32)
    for e in range(rows.shape[1]):
        out[:, sids[e]] += rows[:, e]
    return out


def test_sorted_segment_rows_sum_matches_numpy():
    rng = np.random.default_rng(0)
    F, E, n_rows = 16, 4 * CHUNK, 300
    # sorted ids with heavy repeats AND gaps (jumps > one window)
    sids = np.sort(rng.choice([0, 1, 2, 7, 130, 131, 257, 290, 299],
                              size=E)).astype(np.int32)
    rows = rng.normal(size=(F, E)).astype(np.float32)
    got = np.asarray(sorted_segment_rows_sum(
        jnp.asarray(rows), jnp.asarray(sids), n_rows))
    want = _ref_segsum(rows, sids, n_rows)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sorted_segment_rows_sum_single_giant_segment():
    rng = np.random.default_rng(1)
    F, E, n_rows = 8, 8 * CHUNK, 128
    sids = np.full(E, 77, np.int32)  # every entry in one segment
    rows = rng.normal(size=(F, E)).astype(np.float32)
    got = np.asarray(sorted_segment_rows_sum(
        jnp.asarray(rows), jnp.asarray(sids), n_rows))
    want = _ref_segsum(rows, sids, n_rows)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sorted_segment_rows_sum_far_jump():
    """A jump of many windows within one chunk (sparse ids)."""
    rng = np.random.default_rng(2)
    F, E, n_rows = 8, 2 * CHUNK, 2048
    sids = np.sort(rng.choice([3, 2000, 2047], size=E)).astype(np.int32)
    rows = rng.normal(size=(F, E)).astype(np.float32)
    got = np.asarray(sorted_segment_rows_sum(
        jnp.asarray(rows), jnp.asarray(sids), n_rows))
    want = _ref_segsum(rows, sids, n_rows)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gather_rows_segsum_vjp_matches_scatter():
    """The custom VJP must equal the plain gather's scatter-add VJP."""
    rng = np.random.default_rng(3)
    n_rows, F, E = 200, 9, 3 * CHUNK + 17  # unaligned E, F not mult of 8
    feats = jnp.asarray(rng.normal(size=(n_rows, F)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n_rows, size=E, dtype=np.int32))
    # n_live=6 contract: columns >= n_live carry structurally-zero
    # cotangents (the callers' zero-padded feature columns)
    v_np = rng.normal(size=(E, F)).astype(np.float32)
    v_np[:, 6:] = 0.0
    v_rows = jnp.asarray(v_np)

    fwd_got, vjp = jax.vjp(
        lambda f: gather_rows_segsum(f, ids, 6), feats)
    fwd_want, vjp_ref = jax.vjp(lambda f: f[ids], feats)
    np.testing.assert_array_equal(np.asarray(fwd_got), np.asarray(fwd_want))
    (g_got,) = vjp(v_rows)
    (g_want,) = vjp_ref(v_rows)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_want), rtol=1e-5, atol=1e-5)


def test_gather_rows_segsum_inside_jit_grad():
    rng = np.random.default_rng(4)
    n_rows, F, E = 64, 16, CHUNK
    feats = jnp.asarray(rng.normal(size=(n_rows, F)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n_rows, size=E, dtype=np.int32))

    def loss(f):
        return jnp.sum(gather_rows_segsum(f, ids) ** 2)

    g = jax.jit(jax.grad(loss))(feats)
    g_ref = jax.grad(lambda f: jnp.sum(f[ids] ** 2))(feats)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
