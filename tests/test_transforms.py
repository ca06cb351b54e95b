import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.ops import transforms as T
from tests import oracles


def rand_quats(rng, n):
    return rng.normal(size=(n, 4)).astype(np.float32)


def test_quat_to_rotmat_matches_oracle():
    rng = np.random.default_rng(0)
    q = rand_quats(rng, 64)
    got = np.asarray(T.quat_to_rotmat(jnp.asarray(q)))
    want = oracles.quat_to_rotmat_np(q)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_to_rotmat_properties():
    rng = np.random.default_rng(1)
    q = rand_quats(rng, 32)
    R = np.asarray(T.quat_to_rotmat(jnp.asarray(q)), dtype=np.float64)
    eye = np.eye(3)
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.tile(eye, (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_quat_identity_and_known_rotation():
    # identity quaternion
    np.testing.assert_allclose(
        np.asarray(T.quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))), np.eye(3), atol=1e-6
    )
    # 90 degrees about z: (cos45, 0, 0, sin45); maps x->y
    q = jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)], dtype=jnp.float32)
    R = np.asarray(T.quat_to_rotmat(q))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_rotmat_quat_roundtrip():
    rng = np.random.default_rng(2)
    q = rand_quats(rng, 128)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    R = T.quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(T.rotmat_to_quat(R))
    # q and -q are the same rotation
    sign = np.sign((q * q2).sum(-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


def test_quat_mul_vs_rotmat_composition():
    rng = np.random.default_rng(3)
    q1 = jnp.asarray(rand_quats(rng, 16))
    q2 = jnp.asarray(rand_quats(rng, 16))
    R12 = np.asarray(T.quat_to_rotmat(T.quat_mul(q1, q2)))
    want = np.asarray(T.quat_to_rotmat(q1)) @ np.asarray(T.quat_to_rotmat(q2))
    np.testing.assert_allclose(R12, want, atol=1e-5)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rand_quats(rng, 16))
    v = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    got = np.asarray(T.quat_rotate(q, v))
    R = np.asarray(T.quat_to_rotmat(q))
    want = np.einsum("nij,nj->ni", R, np.asarray(v))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_scale_to_covar_preci():
    rng = np.random.default_rng(5)
    q = rand_quats(rng, 32)
    s = rng.uniform(0.2, 2.0, size=(32, 3)).astype(np.float32)
    covar, preci = T.quat_scale_to_covar_preci(jnp.asarray(q), jnp.asarray(s))
    want = oracles.covar_np(q, s)
    np.testing.assert_allclose(np.asarray(covar), want, rtol=1e-4, atol=1e-5)
    # precision is the inverse of covariance
    prod = np.asarray(covar, dtype=np.float64) @ np.asarray(preci, dtype=np.float64)
    np.testing.assert_allclose(prod, np.tile(np.eye(3), (32, 1, 1)), atol=1e-3)


def test_quat_scale_to_covar_triu():
    rng = np.random.default_rng(6)
    q = jnp.asarray(rand_quats(rng, 8))
    s = jnp.asarray(rng.uniform(0.2, 2.0, size=(8, 3)).astype(np.float32))
    full, _ = T.quat_scale_to_covar_preci(q, s, compute_preci=False)
    tri, _ = T.quat_scale_to_covar_preci(q, s, compute_preci=False, triu=True)
    full = np.asarray(full)
    tri = np.asarray(tri)
    want = np.stack(
        [full[:, 0, 0], full[:, 0, 1], full[:, 0, 2], full[:, 1, 1], full[:, 1, 2], full[:, 2, 2]],
        axis=-1,
    )
    np.testing.assert_allclose(tri, want, atol=1e-6)


def test_world_to_cam():
    rng = np.random.default_rng(7)
    N, C = 10, 3
    means = rng.normal(size=(N, 3)).astype(np.float32)
    q = rand_quats(rng, N)
    s = rng.uniform(0.2, 1.0, size=(N, 3)).astype(np.float32)
    covars = oracles.covar_np(q, s).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    for c in range(C):
        Rc = oracles.quat_to_rotmat_np(rng.normal(size=4))
        viewmats[c, :3, :3] = Rc
        viewmats[c, :3, 3] = rng.normal(size=3)

    mc, cc = T.world_to_cam(jnp.asarray(means), jnp.asarray(covars), jnp.asarray(viewmats))
    mc, cc = np.asarray(mc), np.asarray(cc)
    for c in range(C):
        R, t = viewmats[c, :3, :3], viewmats[c, :3, 3]
        np.testing.assert_allclose(mc[c], means @ R.T + t, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            cc[c], np.einsum("ij,njk,lk->nil", R, covars, R), rtol=1e-3, atol=1e-5
        )


def test_grads_flow():
    rng = np.random.default_rng(8)
    q = jnp.asarray(rand_quats(rng, 4))
    s = jnp.asarray(rng.uniform(0.5, 1.0, size=(4, 3)).astype(np.float32))

    def loss(q, s):
        c, p = T.quat_scale_to_covar_preci(q, s)
        return jnp.sum(c) + jnp.sum(p)

    gq, gs = jax.grad(loss, argnums=(0, 1))(q, s)
    assert np.isfinite(np.asarray(gq)).all()
    assert np.isfinite(np.asarray(gs)).all()


def test_sym6_components_match_matrix_forms():
    """The structure-of-arrays helpers (quat_scale_to_covar_sym6,
    covar_cam_sym6, pos_world_to_cam) must agree with the matrix-form
    reference chain they replaced in the hot projection path."""
    rng = np.random.default_rng(11)
    N, C = 40, 3
    q = rand_quats(rng, N)
    s = rng.uniform(0.2, 1.0, size=(N, 3)).astype(np.float32)
    means = rng.normal(size=(N, 3)).astype(np.float32)
    viewmats = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    for c in range(C):
        viewmats[c, :3, :3] = oracles.quat_to_rotmat_np(rng.normal(size=4))
        viewmats[c, :3, 3] = rng.normal(size=3)

    covars = oracles.covar_np(q, s)  # [N, 3, 3] f64 reference

    s00, s01, s02, s11, s12, s22 = (
        np.asarray(x)
        for x in T.quat_scale_to_covar_sym6(jnp.asarray(q), jnp.asarray(s))
    )
    np.testing.assert_allclose(s00, covars[:, 0, 0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(s01, covars[:, 0, 1], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(s02, covars[:, 0, 2], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(s11, covars[:, 1, 1], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(s12, covars[:, 1, 2], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(s22, covars[:, 2, 2], rtol=1e-4, atol=1e-6)

    cam6 = [
        np.asarray(x)
        for x in T.covar_cam_sym6(
            T.quat_scale_to_covar_sym6(jnp.asarray(q), jnp.asarray(s)),
            jnp.asarray(viewmats),
        )
    ]  # 6 arrays [C, N]
    mc = np.asarray(
        T.pos_world_to_cam(jnp.asarray(means), jnp.asarray(viewmats))
    )  # [C, N, 3]
    for c in range(C):
        R, t = viewmats[c, :3, :3], viewmats[c, :3, 3]
        np.testing.assert_allclose(mc[c], means @ R.T + t, rtol=1e-4,
                                   atol=1e-5)
        ref = np.einsum("ij,njk,lk->nil", R, covars, R)
        for comp, (i, j) in zip(
            cam6, ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
        ):
            np.testing.assert_allclose(
                comp[c], ref[:, i, j], rtol=1e-3, atol=1e-5,
                err_msg=f"cam covar comp ({i},{j}) cam {c}",
            )
