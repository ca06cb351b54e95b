"""Binding rigid-body state to gaussian splats + the fused step/render loop.

Generalizes the reference's ``apply_transform`` (main.py:183-228: rotate
means about the cluster centroid, compose quats, translate) to batched
per-cluster SE(3) over the whole splat set in one gather — and fuses
physics stepping, splat transformation, and rasterization into a single
jit program (BASELINE.json: "per-step SE(3) cluster transforms of Gaussian
means/quats/covariances fuse with rasterization into one jit-compiled
step/render inner loop").

Covariances rotate for free: Σ = R(q) S Sᵀ R(q)ᵀ, so composing the body's
delta rotation into each gaussian's quaternion rotates Σ exactly.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdgs.models.gaussians import SplatParams
from tdgs.physics.bodies import BodyState, RigidBodies


def labels_to_body_ids(labels: np.ndarray, groups: Dict[int, np.ndarray]) -> np.ndarray:
    """Per-gaussian body index (−1 = background/static world)."""
    body_of_label = {lbl: i for i, lbl in enumerate(sorted(groups))}
    out = np.full(labels.shape, -1, np.int32)
    for lbl, idx in groups.items():
        out[idx] = body_of_label[lbl]
    return out


def apply_cluster_transforms(
    means: jnp.ndarray,  # [N, 3]
    quats: jnp.ndarray,  # [N, 4]
    body_ids: jnp.ndarray,  # [N] int32, −1 = untouched
    state: BodyState,
    bodies: RigidBodies,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rigid SE(3) per body applied to its member gaussians.

    means' = R_Δ (means − com0) + x,  quats' = q_Δ ⊗ quats,
    with q_Δ = q ⊗ q0⁻¹ — identity when the body hasn't moved.
    """
    from tdgs.ops.transforms import quat_mul, quat_normalize, quat_rotate

    B = state.x.shape[0]
    # pad with an identity body at index B for background gaussians
    bid = jnp.where(body_ids < 0, B, body_ids)
    q0 = jnp.concatenate([bodies.q0, jnp.array([[1.0, 0, 0, 0]])])
    qn = jnp.concatenate([state.q, jnp.array([[1.0, 0, 0, 0]])])
    com0 = jnp.concatenate([bodies.com0, jnp.zeros((1, 3))])
    xn = jnp.concatenate([state.x, jnp.zeros((1, 3))])

    q0g = q0[bid]
    qng = qn[bid]
    q0_inv = q0g * jnp.array([1.0, -1.0, -1.0, -1.0])
    q_delta = quat_normalize(quat_mul(qng, q0_inv))

    new_means = quat_rotate(q_delta, means - com0[bid]) + xn[bid]
    new_quats = quat_mul(q_delta, quats)
    return new_means, new_quats


def make_step_and_render(
    splats: SplatParams,
    body_ids: jnp.ndarray,  # [N]
    bodies: RigidBodies,
    render_fn: Callable,  # (means, quats) -> (img, alpha)
    params=None,
    substeps: int = 8,
):
    """Build the fused jit step/render: advance physics `substeps` ticks then
    render the transformed splats — one compiled program per frame."""
    from tdgs.physics.engine import PhysicsParams, physics_step

    params = params or PhysicsParams()

    @jax.jit
    def step_and_render(state: BodyState):
        def tick(st, _):
            return physics_step(st, bodies, params), None

        state, _ = jax.lax.scan(tick, state, None, length=substeps)
        means, quats = apply_cluster_transforms(
            splats["means"], splats["quats"], body_ids, state, bodies
        )
        img, alpha = render_fn(means, quats)
        return state, img, alpha

    return step_and_render
