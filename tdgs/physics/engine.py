"""Rigid-body dynamics engine: SAT collision + impulse contacts + symplectic
Euler, all static-shape jnp (one jit per step, lax.scan for rollouts).

New code per BASELINE.json's north star (the reference has no physics
implementation to port — SURVEY.md critical reality check). Conventions:
z-up, gravity −z, ground plane z = 0.

Collision model (static shapes throughout):
- body-ground: the 8 OBB corners of every body vs the z=0 plane → [B, 8]
  candidate contacts, masked by penetration.
- body-body: all B·(B−1)/2 OBB pairs via SAT over the 15 separating axes;
  contact points are corners of each box inside the other (16 candidates
  per pair), normal = minimum-penetration face axis.
- resolution: iterated impulses with accumulated-impulse projection
  (Jacobi with under-relaxation — deterministic and parallel, the
  TPU-friendly replacement for Gauss-Seidel sequential impulses), plus
  Baumgarte positional bias and Coulomb friction clamped by μ·jₙ.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tdgs.ops.transforms import quat_mul, quat_normalize, quat_to_rotmat
from tdgs.physics.bodies import BodyState, RigidBodies

_CORNER_SIGNS = jnp.array(
    [
        [sx, sy, sz]
        for sx in (-1.0, 1.0)
        for sy in (-1.0, 1.0)
        for sz in (-1.0, 1.0)
    ]
)  # [8, 3]


class PhysicsParams(NamedTuple):
    dt: float = 1.0 / 240.0
    gravity: float = -9.81
    restitution: float = 0.05
    friction: float = 0.6
    baumgarte: float = 0.2
    slop: float = 1e-4
    max_bias: float = 0.5  # cap on positional-correction velocity (m/s)
    solver_iters: int = 8  # mass-split Jacobi converges for domino scenes by 8
    relaxation: float = 1.0


def box_corners(state: BodyState, bodies: RigidBodies) -> jnp.ndarray:
    """World-space OBB corners [B, 8, 3]."""
    R = quat_to_rotmat(state.q)  # [B, 3, 3]
    local = _CORNER_SIGNS[None, :, :] * bodies.half_extents[:, None, :]
    return state.x[:, None, :] + jnp.einsum("bij,bkj->bki", R, local)


# ---------------------------------------------------------------------------
# Contact generation
# ---------------------------------------------------------------------------


class Contacts(NamedTuple):
    """Flat contact list (fixed capacity). Body index −/= `a` gets −impulse."""

    a: jnp.ndarray  # [M] int32 body index (or B for ground/world)
    b: jnp.ndarray  # [M] int32 body index
    point: jnp.ndarray  # [M, 3] world contact point
    normal: jnp.ndarray  # [M, 3] from a to b
    depth: jnp.ndarray  # [M] penetration (>0 = touching)
    valid: jnp.ndarray  # [M] bool


def ground_contacts(state: BodyState, bodies: RigidBodies) -> Contacts:
    B = state.x.shape[0]
    corners = box_corners(state, bodies)  # [B, 8, 3]
    depth = -corners[..., 2]  # penetration below z=0
    valid = depth > 0.0
    a = jnp.full((B, 8), B, jnp.int32)  # world
    b = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, 8))
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (B, 8, 3))
    return Contacts(
        a=a.reshape(-1),
        b=b.reshape(-1),
        point=corners.reshape(-1, 3),
        normal=normal.reshape(-1, 3),
        depth=depth.reshape(-1),
        valid=valid.reshape(-1),
    )


def _sat_pair(xa, qa, ha, xb, qb, hb):
    """SAT for one OBB pair. Returns (overlap, depth, normal a→b)."""
    Ra = quat_to_rotmat(qa)
    Rb = quat_to_rotmat(qb)
    axes_a = Ra.T  # rows = world axes of a
    axes_b = Rb.T
    cross = jnp.stack(
        [jnp.cross(axes_a[i], axes_b[j]) for i in range(3) for j in range(3)]
    )
    axes = jnp.concatenate([axes_a, axes_b, cross], axis=0)  # [15, 3]
    norms = jnp.linalg.norm(axes, axis=-1, keepdims=True)
    axes = axes / jnp.maximum(norms, 1e-9)
    degenerate = norms[:, 0] < 1e-6  # parallel edge axes

    d = xb - xa
    dist = jnp.abs(axes @ d)
    ra = jnp.sum(jnp.abs(axes @ Ra) * ha[None, :], axis=-1)
    rb = jnp.sum(jnp.abs(axes @ Rb) * hb[None, :], axis=-1)
    pen = ra + rb - dist  # [15]
    pen = jnp.where(degenerate, jnp.inf, pen)
    overlap = jnp.all(pen > 0.0)

    # prefer face axes (first 6) slightly to avoid edge-axis jitter
    bias = jnp.concatenate([jnp.zeros(6), jnp.full(9, 1e-5)])
    k = jnp.argmin(pen + bias)
    n = axes[k]
    n = jnp.where(jnp.dot(n, d) < 0.0, -n, n)  # a → b
    return overlap, pen[k], n


def _corner_depths_along_normal(pts, n, x, q, h, margin_frac=0.15):
    """Per-corner penetration measured ALONG the SAT normal n into box
    (x, q, h): depth = support(h, n) − (x − p)·n, valid only when the corner
    is laterally contained in the (slightly expanded) box.

    Measuring along the SAT axis (instead of nearest-face distance) keeps
    face-face impacts well-posed when corners graze the other box's boundary
    exactly — e.g. equal-width dominoes hitting flat."""
    R = quat_to_rotmat(q)
    r_n = jnp.sum(jnp.abs(n @ R) * h)  # box support radius along n
    depth = r_n - (x - pts) @ n  # [8]
    local = (pts - x) @ R  # [8, 3] body-frame coords
    inside = jnp.all(jnp.abs(local) <= h * (1.0 + margin_frac) + 1e-3, axis=-1)
    return depth, inside


def pair_contacts(state: BodyState, bodies: RigidBodies) -> Contacts:
    B = state.x.shape[0]
    corners = box_corners(state, bodies)  # [B, 8, 3]
    ii, jj = jnp.triu_indices(B, k=1)

    def one_pair(i, j):
        overlap, sat_depth, n = _sat_pair(
            state.x[i], state.q[i], bodies.half_extents[i],
            state.x[j], state.q[j], bodies.half_extents[j],
        )
        # corners of i penetrating j along +n, corners of j penetrating i
        # along −n → 16 candidates
        d_i, in_j = _corner_depths_along_normal(
            corners[i], n, state.x[j], state.q[j], bodies.half_extents[j]
        )
        d_j, in_i = _corner_depths_along_normal(
            corners[j], -n, state.x[i], state.q[i], bodies.half_extents[i]
        )
        pts = jnp.concatenate([corners[i], corners[j]], axis=0)  # [16, 3]
        depths = jnp.concatenate([d_i, d_j])  # [16]
        # cap at the SAT depth (a corner can't be deeper than the overlap)
        depths = jnp.minimum(depths, sat_depth)
        valid = overlap & (depths > 0.0) & jnp.concatenate([in_j, in_i])
        a = jnp.full((16,), i, jnp.int32)
        b = jnp.full((16,), j, jnp.int32)
        normal = jnp.broadcast_to(n, (16, 3))
        return a, b, pts, normal, depths, valid

    a, b, pts, nrm, dep, val = jax.vmap(one_pair)(ii, jj)
    return Contacts(
        a=a.reshape(-1),
        b=b.reshape(-1),
        point=pts.reshape(-1, 3),
        normal=nrm.reshape(-1, 3),
        depth=dep.reshape(-1),
        valid=val.reshape(-1),
    )


# ---------------------------------------------------------------------------
# Impulse solver
# ---------------------------------------------------------------------------


def _body_vel_at(state, idx, point, B):
    """Velocity of material point `point` of body idx (zero for world idx==B)."""
    is_world = idx == B
    v = jnp.where(is_world[..., None], 0.0, state.v[jnp.minimum(idx, B - 1)])
    w = jnp.where(is_world[..., None], 0.0, state.w[jnp.minimum(idx, B - 1)])
    x = jnp.where(is_world[..., None], point, state.x[jnp.minimum(idx, B - 1)])
    return v + jnp.cross(w, point - x)


def resolve_contacts(
    state: BodyState,
    bodies: RigidBodies,
    contacts: Contacts,
    params: PhysicsParams,
) -> BodyState:
    B = state.x.shape[0]
    M = contacts.a.shape[0]
    inv_m = jnp.concatenate([bodies.inv_mass, jnp.zeros((1,))])  # world = static
    R = quat_to_rotmat(state.q)
    inv_I_world = jnp.einsum(
        "bij,bjk,blk->bil", R, bodies.inv_inertia_body, R
    )
    inv_I = jnp.concatenate([inv_I_world, jnp.zeros((1, 3, 3))])

    ia = jnp.minimum(contacts.a, B)
    ib = jnp.minimum(contacts.b, B)

    # Mass splitting for stable Jacobi iteration: each contact sees a body
    # of mass m/n (n = its contact count) in the EFFECTIVE-mass term, while
    # impulses apply to the real mass — so n simultaneous impulses sum to at
    # most the sequential correction. Deterministic and jit-friendly — the
    # TPU substitute for sequential Gauss-Seidel impulses.
    valid_f = contacts.valid.astype(jnp.float32)
    cnt = jnp.zeros((B + 1,)).at[ia].add(valid_f).at[ib].add(valid_f)
    cnt = jnp.maximum(cnt, 1.0)
    inv_m_k = inv_m * cnt  # for k terms only
    inv_I_k = inv_I * cnt[:, None, None]
    ra = contacts.point - jnp.where(
        (contacts.a == B)[:, None], contacts.point, state.x[jnp.minimum(contacts.a, B - 1)]
    )
    rb = contacts.point - jnp.where(
        (contacts.b == B)[:, None], contacts.point, state.x[jnp.minimum(contacts.b, B - 1)]
    )
    n = contacts.normal

    # effective mass along normal per contact (mass-split)
    def k_term(idx, r):
        rxn = jnp.cross(r, n)
        return inv_m_k[idx] + jnp.einsum("mi,mij,mj->m", rxn, inv_I_k[idx], rxn)

    k_n = k_term(ia, ra) + k_term(ib, rb)
    k_n = jnp.maximum(k_n, 1e-9)

    bias = jnp.minimum(
        params.baumgarte / params.dt
        * jnp.maximum(contacts.depth - params.slop, 0.0),
        params.max_bias,
    )

    def apply_impulses(state, impulses_n, impulses_t, t_dir,
                       impulses_t2=None, t2_dir=None):
        """Aggregate all contact impulses into per-body velocity deltas."""
        P = impulses_n[:, None] * n + impulses_t[:, None] * t_dir  # [M, 3]
        if impulses_t2 is not None:
            P = P + impulses_t2[:, None] * t2_dir
        dv = jnp.zeros((B + 1, 3))
        dw = jnp.zeros((B + 1, 3))
        dv = dv.at[ib].add(P * inv_m[ib][:, None])
        dv = dv.at[ia].add(-P * inv_m[ia][:, None])
        dw = dw.at[ib].add(jnp.einsum("mij,mj->mi", inv_I[ib], jnp.cross(rb, P)))
        dw = dw.at[ia].add(-jnp.einsum("mij,mj->mi", inv_I[ia], jnp.cross(ra, P)))
        return state._replace(
            v=state.v + dv[:B], w=state.w + dw[:B]
        )

    # loop-invariants hoisted OUT of the Jacobi scan (XLA does not move
    # code out of while-loop bodies; at 16 bodies the solver is op-count
    # bound — 8 substeps x 8 iterations of tiny [M] tensors were ~60% of
    # the rally frame): the tangent frame depends only on the contact
    # normals, and the friction effective mass as written equals k_n (its
    # k_term uses the normal-arm cross products).
    t1 = jnp.cross(n, jnp.array([0.0, 0.0, 1.0]))
    t1 = jnp.where(
        jnp.linalg.norm(t1, axis=-1, keepdims=True) < 1e-6,
        jnp.cross(n, jnp.array([1.0, 0.0, 0.0])),
        t1,
    )
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)

    def iteration(carry, _):
        st, acc_n, acc_t1, acc_t2 = carry
        va = _body_vel_at(st, contacts.a, contacts.point, B)
        vb = _body_vel_at(st, contacts.b, contacts.point, B)
        v_rel = vb - va
        v_n = jnp.einsum("mi,mi->m", v_rel, n)

        j_n = -(1.0 + params.restitution) * v_n + bias
        j_n = j_n / k_n * params.relaxation
        new_acc = jnp.maximum(acc_n + jnp.where(contacts.valid, j_n, 0.0), 0.0)
        d_n = new_acc - acc_n

        def fr(acc_t, t_dir):
            v_t = jnp.einsum("mi,mi->m", v_rel, t_dir)
            j_t = -v_t / jnp.maximum(k_n, 1e-9) * params.relaxation
            lim = params.friction * new_acc
            new = jnp.clip(acc_t + jnp.where(contacts.valid, j_t, 0.0), -lim, lim)
            return new, new - acc_t

        new_t1, d_t1 = fr(acc_t1, t1)
        new_t2, d_t2 = fr(acc_t2, t2)

        # one aggregated impulse application: dv/dw are linear in the
        # total impulse, so normal + both tangents fold into a single
        # scatter pass (was two apply_impulses calls = 8 scatter-adds)
        st = apply_impulses(st, d_n, d_t1, t1, d_t2, t2)
        return (st, new_acc, new_t1, new_t2), None

    zeros = jnp.zeros((M,))
    (state, _, _, _), _ = jax.lax.scan(
        iteration, (state, zeros, zeros, zeros), None,
        length=params.solver_iters,
    )
    return state


# ---------------------------------------------------------------------------
# Step / rollout
# ---------------------------------------------------------------------------


def physics_step(
    state: BodyState,
    bodies: RigidBodies,
    params: PhysicsParams = PhysicsParams(),
) -> BodyState:
    """One semi-implicit Euler step with contact resolution."""
    dt = params.dt
    # gravity (only dynamic bodies)
    dyn = (bodies.inv_mass > 0.0)[:, None]
    v = state.v + jnp.where(dyn, jnp.array([0.0, 0.0, params.gravity]) * dt, 0.0)
    state = state._replace(v=v)

    gc = ground_contacts(state, bodies)
    if state.x.shape[0] > 1:
        pc = pair_contacts(state, bodies)
        contacts = Contacts(
            *[
                jnp.concatenate([getattr(gc, f), getattr(pc, f)])
                for f in Contacts._fields
            ]
        )
    else:
        contacts = gc
    state = resolve_contacts(state, bodies, contacts, params)

    # integrate
    x = state.x + state.v * dt
    dq = 0.5 * dt * quat_mul(
        jnp.concatenate([jnp.zeros_like(state.w[:, :1]), state.w], axis=-1),
        state.q,
    )
    q = quat_normalize(state.q + dq)
    return state._replace(x=x, q=q)


@functools.partial(jax.jit, static_argnames=("n_steps", "params"))
def simulate(
    state: BodyState,
    bodies: RigidBodies,
    params: PhysicsParams,
    n_steps: int,
) -> Tuple[BodyState, BodyState]:
    """Roll out n_steps with lax.scan; returns (final, trajectory)."""

    def step(st, _):
        st = physics_step(st, bodies, params)
        return st, st

    return jax.lax.scan(step, state, None, length=n_steps)
