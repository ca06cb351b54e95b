"""tdgs — a TPU-native dynamic 3D Gaussian Splatting + rigid-body framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
``JTStephens18/3DGS_rigidbody`` reference (a gsplat v1.5.3 fork), redesigned
TPU-first:

- dense ``[C, N]`` layouts + validity masks instead of packed/COO modes
- a global ``lax.sort`` over (tile, depth) keys instead of CUB radix sort
- alpha compositing as a parallel prefix-product instead of a sequential
  per-pixel loop (mathematically identical, see ``tdgs.ops.rasterize_jax``)
- Pallas kernels for the tile rasterizer hot loop, with a deterministic
  segment-sum backward pass instead of CUDA atomics
- ``jax.sharding.Mesh`` + ``shard_map`` collectives instead of NCCL

Public API mirrors the reference's ``gsplat/__init__.py`` surface.
"""

from tdgs.ops.transforms import (
    quat_to_rotmat,
    quat_scale_to_covar_preci,
    world_to_cam,
)
from tdgs.ops.projection import (
    proj,
    fully_fused_projection,
)
from tdgs.ops.sh import spherical_harmonics
from tdgs.ops.tiling import isect_tiles, isect_offset_encode
from tdgs.rendering import rasterization

__version__ = "0.1.0"

__all__ = [
    "quat_to_rotmat",
    "quat_scale_to_covar_preci",
    "world_to_cam",
    "proj",
    "fully_fused_projection",
    "spherical_harmonics",
    "isect_tiles",
    "isect_offset_encode",
    "rasterization",
    "__version__",
]
