"""Physics unit tests: analytic scenarios the reference never had
(SURVEY.md §4: momentum/energy conservation, analytic box drop)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdgs.physics.bodies import (
    BodyState,
    RigidBodies,
    body_from_gaussians,
    initial_state,
    make_box_body,
    stack_bodies,
)
from tdgs.physics.engine import PhysicsParams, physics_step, simulate
from tdgs.physics.splat_binding import apply_cluster_transforms
from tdgs.ops.transforms import quat_to_rotmat


def test_free_fall_matches_analytic():
    body = make_box_body([0.1, 0.1, 0.1], position=[0, 0, 10.0])
    st = initial_state(body)
    params = PhysicsParams(dt=1e-3)
    n = 200
    final, _ = simulate(st, body, params, n)
    t = n * params.dt
    # semi-implicit Euler: z = z0 + Σ v_k dt, v_k = g k dt
    z_expected = 10.0 + params.gravity * params.dt**2 * n * (n + 1) / 2
    np.testing.assert_allclose(float(final.x[0, 2]), z_expected, rtol=1e-4)
    np.testing.assert_allclose(
        float(final.v[0, 2]), params.gravity * t, rtol=1e-5
    )


def test_box_drop_comes_to_rest_on_ground():
    body = make_box_body([0.2, 0.2, 0.2], position=[0, 0, 0.5])
    st = initial_state(body)
    params = PhysicsParams(dt=1/240, restitution=0.0)
    final, traj = simulate(st, body, params, 600)
    # resting: center at half-height above ground, tiny velocity
    assert abs(float(final.x[0, 2]) - 0.2) < 0.02, float(final.x[0, 2])
    assert float(jnp.linalg.norm(final.v[0])) < 0.05
    assert float(jnp.linalg.norm(final.x[0, :2])) < 1e-3  # no lateral drift


def test_momentum_conserved_without_external_forces():
    # two boxes colliding mid-air, no gravity, no ground contact
    b1 = make_box_body([0.2, 0.2, 0.2], position=[-0.5, 0, 10.0], mass=1.0)
    b2 = make_box_body([0.2, 0.2, 0.2], position=[0.5, 0.01, 10.0], mass=2.0)
    bodies = stack_bodies(b1, b2)
    st = initial_state(bodies)
    st = st._replace(v=jnp.array([[2.0, 0, 0], [0.0, 0, 0]]))
    params = PhysicsParams(dt=1e-3, gravity=0.0, restitution=0.5, friction=0.0)
    final, _ = simulate(st, bodies, params, 500)
    p0 = 1.0 * 2.0  # initial momentum x
    p1 = float(1.0 * final.v[0, 0] + 2.0 * final.v[1, 0])
    np.testing.assert_allclose(p1, p0, rtol=1e-3)
    # they actually collided: second box moving
    assert float(final.v[1, 0]) > 0.1
    # energy not increased
    e0 = 0.5 * 1.0 * 2.0**2
    e1 = 0.5 * 1.0 * float(jnp.sum(final.v[0] ** 2)) + 0.5 * 2.0 * float(
        jnp.sum(final.v[1] ** 2)
    )
    assert e1 <= e0 * 1.01


def test_domino_topples_neighbor():
    """A pushed domino must knock over its neighbor (the README scenario)."""
    h, w, t = 0.4, 0.2, 0.04  # tall thin boxes
    d1 = make_box_body([t, w, h], position=[0, 0, h])
    d2 = make_box_body([t, w, h], position=[0.5, 0, h])
    bodies = stack_bodies(d1, d2)
    st = initial_state(bodies)
    # push the first domino towards the second
    st = st._replace(w=jnp.array([[0.0, 3.0, 0.0], [0, 0, 0]]))
    params = PhysicsParams(dt=1 / 240, friction=0.8, restitution=0.0)
    final, traj = simulate(st, bodies, params, 1200)
    # domino 2 has tipped: its up-axis deviates strongly from world z
    R2 = np.asarray(quat_to_rotmat(final.q[1]))
    up_z = R2[2, 2]
    assert up_z < 0.7, up_z  # tipped by > ~45 degrees
    # and both ended up roughly lying down (z center near thickness)
    assert float(final.x[1, 2]) < 0.3


def test_body_from_gaussians_analytic_box():
    """Gaussians uniformly sampled in a box reproduce the box inertia."""
    rng = np.random.default_rng(90)
    n = 4000
    hx, hy, hz = 0.3, 0.2, 0.1
    pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32) * [hx, hy, hz]
    pts += [1.0, 2.0, 3.0]
    covars = np.tile(np.eye(3, dtype=np.float32) * 1e-8, (n, 1, 1))
    masses = np.ones(n, np.float32)
    mass, com, inertia, R, half = body_from_gaussians(
        jnp.asarray(pts), jnp.asarray(covars), jnp.asarray(masses),
        total_mass=1.0,
    )
    np.testing.assert_allclose(np.asarray(com), [1.0, 2.0, 3.0], atol=5e-3)
    want = np.diag([
        (hy**2 + hz**2) / 3, (hx**2 + hz**2) / 3, (hx**2 + hy**2) / 3
    ])
    got = np.asarray(inertia)
    np.testing.assert_allclose(got, want, atol=5e-3)
    # OBB covers the box
    assert np.all(np.sort(np.asarray(half))[::-1] > [hx * 0.9, hy * 0.9, hz * 0.9])


def test_apply_cluster_transforms_identity_and_translation():
    rng = np.random.default_rng(91)
    n = 50
    means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    body = make_box_body([1, 1, 1], position=[0.0, 0.0, 0.0])
    st = initial_state(body)
    body_ids = jnp.asarray(np.array([0] * 25 + [-1] * 25, np.int32))

    # identity state → unchanged
    m2, q2 = apply_cluster_transforms(means, quats, body_ids, st, body)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(means), atol=1e-6)

    # pure translation moves only member gaussians
    st2 = st._replace(x=st.x + jnp.array([[1.0, 0, 0]]))
    m3, q3 = apply_cluster_transforms(means, quats, body_ids, st2, body)
    np.testing.assert_allclose(
        np.asarray(m3[:25]), np.asarray(means[:25]) + [1, 0, 0], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(m3[25:]), np.asarray(means[25:]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(q3), np.asarray(quats), atol=1e-6)


def test_physics_rate_is_jittable_scan():
    body = make_box_body([0.1, 0.1, 0.1], position=[0, 0, 1.0])
    st = initial_state(body)
    params = PhysicsParams()
    final, traj = simulate(st, body, params, 240)
    assert traj.x.shape == (240, 1, 3)
    assert np.isfinite(np.asarray(final.x)).all()


def test_domino_chain_of_four():
    """Full rally: one push topples a 4-domino chain (splat-like padded
    proportions, the main.py demo geometry)."""
    h = [0.055, 0.21, 0.42]
    ds = [
        make_box_body([h[0], h[1], h[2]], position=[i * 0.42, 0, h[2]])
        for i in range(4)
    ]
    bodies = stack_bodies(*ds)
    st = initial_state(bodies)._replace(
        w=jnp.zeros((4, 3)).at[0, 1].set(7.0)
    )
    params = PhysicsParams(dt=1 / 240, friction=0.5)
    final, _ = simulate(st, bodies, params, 1440)
    for i in range(4):
        R = np.asarray(quat_to_rotmat(final.q[i]))
        assert abs(R[2, 2]) < 0.5, (i, R[2, 2])  # all toppled
