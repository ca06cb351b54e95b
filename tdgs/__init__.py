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

Public API mirrors the reference's ``gsplat/__init__.py`` surface
(symbol-for-symbol where the concept exists on TPU).
"""

from tdgs.compression import PngCompression
from tdgs.ops.camera_models import RollingShutterType
from tdgs.ops.indices import (
    accumulate,
    accumulate_2dgs,
    rasterize_to_indices_in_range,
    rasterize_to_indices_in_range_2dgs,
)
from tdgs.ops.adam import SelectiveAdam, selective_adam
from tdgs.ops.projection import (
    fully_fused_projection,
    proj,
)
from tdgs.ops.projection_2dgs import fully_fused_projection_2dgs
from tdgs.ops.projection_ut import fully_fused_projection_with_ut
from tdgs.ops.rasterize_2dgs_jax import (
    rasterize_to_pixels_2dgs_jax as rasterize_to_pixels_2dgs,
)
from tdgs.ops.rasterize_eval3d import (
    rasterize_to_pixels_eval3d_jax as rasterize_to_pixels_eval3d,
)
from tdgs.ops.rasterize_jax import (
    rasterize_to_pixels_jax as rasterize_to_pixels,
)
from tdgs.ops.relocation import compute_relocation
from tdgs.ops.sh import spherical_harmonics
from tdgs.ops.tiling import isect_offset_encode, isect_tiles
from tdgs.ops.transforms import (
    quat_to_rotmat,
    quat_scale_to_covar_preci,
    world_to_cam,
)
from tdgs.rendering import (
    rasterization,
    rasterization_2dgs,
    rasterization_2dgs_inria_wrapper,
    rasterization_inria_wrapper,
)
from tdgs.strategy import DefaultStrategy, MCMCStrategy, Strategy
from tdgs.utils.ply import export_splats

__version__ = "0.1.0"

__all__ = [
    "PngCompression",
    "DefaultStrategy",
    "MCMCStrategy",
    "Strategy",
    "rasterization",
    "rasterization_2dgs",
    "rasterization_inria_wrapper",
    "rasterization_2dgs_inria_wrapper",
    "spherical_harmonics",
    "isect_offset_encode",
    "isect_tiles",
    "proj",
    "fully_fused_projection",
    "quat_scale_to_covar_preci",
    "quat_to_rotmat",
    "rasterize_to_pixels",
    "world_to_cam",
    "accumulate",
    "rasterize_to_indices_in_range",
    "fully_fused_projection_2dgs",
    "rasterize_to_pixels_2dgs",
    "rasterize_to_indices_in_range_2dgs",
    "accumulate_2dgs",
    "RollingShutterType",
    "fully_fused_projection_with_ut",
    "rasterize_to_pixels_eval3d",
    "SelectiveAdam",
    "selective_adam",
    "compute_relocation",
    "export_splats",
    "__version__",
]
