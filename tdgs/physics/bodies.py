"""Rigid-body extraction from clustered gaussian splats.

Implements the mass/COM/inertia + OBB stage the reference README describes
(README.md:12-13 "рigid body extraction ... mass, center of mass, inertia
tensor, OBB collision shapes") but never implemented (SURVEY.md reality
check). Each gaussian is treated as a mass blob:

- mass mᵢ ∝ opacityᵢ · volumeᵢ (volume = ∏ scales; normalized to a target
  total mass per body)
- COM = Σ mᵢ μᵢ / Σ mᵢ
- inertia: exact second moment of a gaussian blob about the COM:
  Iᵢ = mᵢ [ (tr(Σᵢ) + |dᵢ|²)·I₃ − (Σᵢ + dᵢdᵢᵀ) ]  with dᵢ = μᵢ − COM
- OBB: principal axes of the mass-weighted second-moment matrix; half
  extents cover max |projection of means| + 2σ of each gaussian.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdgs.ops.transforms import quat_scale_to_covar_preci, rotmat_to_quat


class RigidBodies(NamedTuple):
    """Static (per-body) physical properties; B bodies."""

    mass: jnp.ndarray  # [B]
    inv_mass: jnp.ndarray  # [B] (0 for static bodies)
    inertia_body: jnp.ndarray  # [B, 3, 3] in body frame
    inv_inertia_body: jnp.ndarray  # [B, 3, 3]
    half_extents: jnp.ndarray  # [B, 3] OBB half sizes (body frame)
    com0: jnp.ndarray  # [B, 3] initial world COM
    q0: jnp.ndarray  # [B, 4] initial world orientation (wxyz)


class BodyState(NamedTuple):
    """Dynamic per-body state (pytree, scan-friendly)."""

    x: jnp.ndarray  # [B, 3] COM position
    q: jnp.ndarray  # [B, 4] orientation (wxyz)
    v: jnp.ndarray  # [B, 3] linear velocity
    w: jnp.ndarray  # [B, 3] angular velocity (world frame)


def initial_state(bodies: RigidBodies) -> BodyState:
    B = bodies.mass.shape[0]
    return BodyState(
        x=bodies.com0,
        q=bodies.q0,
        v=jnp.zeros((B, 3)),
        w=jnp.zeros((B, 3)),
    )


def gaussian_masses(
    scales: jnp.ndarray,  # [N, 3] post-exp
    opacities: jnp.ndarray,  # [N] post-sigmoid
) -> jnp.ndarray:
    return opacities * jnp.prod(scales, axis=-1)


def body_from_gaussians(
    means: jnp.ndarray,  # [n, 3]
    covars: jnp.ndarray,  # [n, 3, 3]
    masses: jnp.ndarray,  # [n]
    total_mass: float = 1.0,
    sigma_pad: float = 1.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (mass, com, inertia_world, R_obb, half_extents)."""
    m = masses / jnp.maximum(masses.sum(), 1e-12) * total_mass
    com = jnp.sum(m[:, None] * means, axis=0) / total_mass
    d = means - com

    # second moment about COM: S = Σ mᵢ (Σᵢ + dᵢ dᵢᵀ)
    S = jnp.einsum("n,nij->ij", m, covars) + jnp.einsum("n,ni,nj->ij", m, d, d)
    inertia = jnp.trace(S) * jnp.eye(3) - S

    # OBB axes from principal directions of S
    evals, evecs = jnp.linalg.eigh(S)  # ascending
    R = evecs[:, ::-1]  # columns = axes, descending variance
    # enforce right-handedness
    det = jnp.linalg.det(R)
    R = jnp.where(det < 0, R.at[:, 2].set(-R[:, 2]), R)

    # extents: cover means projections plus sigma_pad·σ of each gaussian
    proj = d @ R  # [n, 3] body-frame offsets
    sigma_axis = jnp.sqrt(
        jnp.clip(jnp.einsum("ia,nij,ja->na", R, covars, R), 0.0, None)
    )  # [n, 3] per-gaussian std along each axis
    half = jnp.max(jnp.abs(proj) + sigma_pad * sigma_axis, axis=0)
    return jnp.asarray(total_mass), com, inertia, R, half


def settle_on_ground(bodies: "RigidBodies", slop: float = 1e-3) -> "RigidBodies":
    """Lift each body so its lowest OBB corner rests at z = slop.

    Splat-extracted OBBs are σ-padded beyond the visible surface, so bodies
    typically start penetrated into the z=0 ground plane; the resulting
    penetration-recovery impulses + friction can absorb an initial push
    entirely. Lifting to rest makes the dynamics start clean."""
    from tdgs.ops.transforms import quat_to_rotmat

    R = quat_to_rotmat(bodies.q0)  # [B, 3, 3]
    local = _CORNER_SIGNS[None, :, :] * bodies.half_extents[:, None, :]
    corners = bodies.com0[:, None, :] + jnp.einsum("bij,bkj->bki", R, local)
    min_z = jnp.min(corners[..., 2], axis=1)  # [B]
    lift = jnp.maximum(slop - min_z, 0.0)
    com0 = bodies.com0.at[:, 2].add(lift)
    return bodies._replace(com0=com0)


_CORNER_SIGNS = jnp.array(
    [
        [sx, sy, sz]
        for sx in (-1.0, 1.0)
        for sy in (-1.0, 1.0)
        for sz in (-1.0, 1.0)
    ]
)


def extract_bodies_from_splats(
    means: np.ndarray,  # [N, 3]
    quats: np.ndarray,  # [N, 4]
    scales: np.ndarray,  # [N, 3] post-exp
    opacities: np.ndarray,  # [N] post-sigmoid
    labels: np.ndarray,  # [N] int cluster labels, < 0 = background
    density: float = 1.0,
    static_labels: Tuple[int, ...] = (),
) -> Tuple[RigidBodies, Dict[int, np.ndarray]]:
    """Build RigidBodies from clustered splats (host-side, once per scene).

    Returns (bodies, cluster_indices: label → gaussian index array). Body
    order follows sorted labels. Total mass per body = density · Σ blob
    volumes (so bigger dominoes are heavier).
    """
    from tdgs.ops.transforms import quat_scale_to_covar_preci as qs2c

    labels = np.asarray(labels)
    ids = sorted(int(l) for l in np.unique(labels) if l >= 0)
    covars_all, _ = qs2c(
        jnp.asarray(quats), jnp.asarray(scales), compute_preci=False
    )
    covars_all = np.asarray(covars_all)

    mass_l, inv_mass_l, I_l, invI_l, half_l, com_l, q_l = [], [], [], [], [], [], []
    groups: Dict[int, np.ndarray] = {}
    for lbl in ids:
        idx = np.where(labels == lbl)[0]
        groups[lbl] = idx
        mg = np.asarray(
            gaussian_masses(jnp.asarray(scales[idx]), jnp.asarray(opacities[idx]))
        )
        total = float(density * mg.sum())
        mass, com, inertia, R, half = body_from_gaussians(
            jnp.asarray(means[idx]), jnp.asarray(covars_all[idx]),
            jnp.asarray(mg), total_mass=max(total, 1e-6),
        )
        mass = float(mass)
        inertia = np.asarray(inertia)
        R = np.asarray(R)
        # inertia in body frame (diagonalized by the OBB axes)
        I_body = R.T @ inertia @ R
        q0 = np.asarray(rotmat_to_quat(jnp.asarray(R)))
        is_static = lbl in static_labels
        mass_l.append(mass)
        inv_mass_l.append(0.0 if is_static else 1.0 / mass)
        I_l.append(I_body)
        invI_l.append(
            np.zeros((3, 3)) if is_static else np.linalg.inv(I_body)
        )
        half_l.append(np.asarray(half))
        com_l.append(np.asarray(com))
        q_l.append(q0)

    bodies = RigidBodies(
        mass=jnp.asarray(np.array(mass_l, np.float32)),
        inv_mass=jnp.asarray(np.array(inv_mass_l, np.float32)),
        inertia_body=jnp.asarray(np.array(I_l, np.float32)),
        inv_inertia_body=jnp.asarray(np.array(invI_l, np.float32)),
        half_extents=jnp.asarray(np.array(half_l, np.float32)),
        com0=jnp.asarray(np.array(com_l, np.float32)),
        q0=jnp.asarray(np.array(q_l, np.float32)),
    )
    return bodies, groups


def make_box_body(
    half_extents,
    position,
    mass: float = 1.0,
    quat=(1.0, 0.0, 0.0, 0.0),
    static: bool = False,
) -> RigidBodies:
    """Analytic box body (for tests and synthetic domino scenes)."""
    hx, hy, hz = [float(h) for h in half_extents]
    I = (
        mass
        / 3.0
        * np.diag(
            [hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy]
        )
    )
    return RigidBodies(
        mass=jnp.asarray([mass], jnp.float32),
        inv_mass=jnp.asarray([0.0 if static else 1.0 / mass], jnp.float32),
        inertia_body=jnp.asarray(I[None], jnp.float32),
        inv_inertia_body=jnp.asarray(
            (np.zeros((3, 3)) if static else np.linalg.inv(I))[None], jnp.float32
        ),
        half_extents=jnp.asarray([[hx, hy, hz]], jnp.float32),
        com0=jnp.asarray([list(position)], jnp.float32),
        q0=jnp.asarray([list(quat)], jnp.float32),
    )


def stack_bodies(*bodies: RigidBodies) -> RigidBodies:
    return RigidBodies(
        *[jnp.concatenate([getattr(b, f) for b in bodies]) for f in RigidBodies._fields]
    )
