"""Pure-JAX rigid-body physics stage.

The reference describes this stage (README.md:11-15: NVIDIA Warp rigid-body
sim of segmented dominoes) but ships no implementation — main.py only
applies per-cluster SE(3) transforms to splats (main.py:183-228) and the
animation loop is commented out (:348-409). This module implements the full
stage as new TPU-native code per BASELINE.json's north star:

- per-cluster mass / COM / inertia extraction from gaussian splats
- OBB collision shapes from cluster PCA
- semi-implicit Euler integration
- impulse-based contact resolution (OBB-OBB SAT + ground plane)
- per-step SE(3) cluster transforms fused with rasterization into one
  jit-compiled step/render loop

State is a pytree of (x, q, v, w) per body; every step is one fixed-shape
jit program (static body count, masked contacts) so it scans/jits cleanly.
"""

from tdgs.physics.bodies import (
    RigidBodies,
    extract_bodies_from_splats,
    settle_on_ground,
)
from tdgs.physics.engine import (
    PhysicsParams,
    physics_step,
    simulate,
)
from tdgs.physics.splat_binding import (
    apply_cluster_transforms,
    make_step_and_render,
)

__all__ = [
    "RigidBodies",
    "extract_bodies_from_splats",
    "settle_on_ground",
    "PhysicsParams",
    "physics_step",
    "simulate",
    "apply_cluster_transforms",
    "make_step_and_render",
]
