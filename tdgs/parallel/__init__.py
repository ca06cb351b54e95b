"""Multi-device rendering and training over a jax.sharding.Mesh.

Replaces the reference's NCCL distributed layer (gsplat/distributed.py +
rendering.py:360-611 gaussian-sharded data parallelism from "On Scaling Up
3DGS Training", arXiv:2406.18533) with ICI/DCN mesh collectives.
"""

from tdgs.parallel.mesh import make_mesh
from tdgs.parallel.sharded_render import (
    rasterization_2dgs_sharded,
    rasterization_eval3d_sharded,
    rasterization_replicated,
    rasterization_sharded,
)

__all__ = [
    "make_mesh",
    "rasterization_2dgs_sharded",
    "rasterization_replicated",
    "rasterization_eval3d_sharded",
    "rasterization_sharded",
]
