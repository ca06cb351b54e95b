"""Independent reference-chain renders from the upstream torch oracle.

Loads the reference implementation's pure-torch oracle modules
(gsplat/cuda/_torch_impl.py — the CPU oracle the reference tests its own
CUDA kernels against) and renders a frame with EVERY intermediate derived
by reference code: projection (_torch_impl.py:286), spherical harmonics
(:804), tile intersection (:378) and offset encoding (:477) — composited
by the float64 numpy compositor (tdgs.utils.golden). Nothing from the
tdgs compute path is consumed, so a projection or tiling bug in tdgs
cannot leak into the golden (unlike re-compositing the kernel's own
meta intermediates).

Optional: requires torch and a reference checkout; callers gate on
:func:`available`.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types
from typing import Optional

import numpy as np

REF_CUDA_DIR = os.environ.get(
    "TDGS_REFERENCE_DIR", "/root/reference"
) + "/gsplat/cuda"


def available() -> bool:
    if not os.path.isdir(REF_CUDA_DIR):
        return False
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    return True


_REF = None


def _load():
    """Import the reference oracle module without executing the gsplat
    package __init__ (which requires the CUDA build)."""
    global _REF
    if _REF is not None:
        return _REF
    for name in ("gsplat", "gsplat.cuda"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            sys.modules[name] = pkg
    fullname = "gsplat.cuda._torch_impl"
    if fullname in sys.modules:
        _REF = sys.modules[fullname]
        return _REF
    spec = importlib.util.spec_from_file_location(
        fullname, os.path.join(REF_CUDA_DIR, "_torch_impl.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    _REF = mod
    return _REF


def reference_chain_render(
    means: np.ndarray,  # [N, 3]
    quats: np.ndarray,  # [N, 4] wxyz (ACTIVATED: unit-normalized ok or raw)
    scales: np.ndarray,  # [N, 3] ACTIVATED (exp already applied)
    opacities: np.ndarray,  # [N] ACTIVATED (sigmoid already applied)
    sh: np.ndarray,  # [N, K, 3]
    viewmat: np.ndarray,  # [4, 4]
    K: np.ndarray,  # [3, 3]
    width: int,
    height: int,
    sh_degree: int,
    tile_size: int = 16,
    background: Optional[np.ndarray] = None,
    eps2d: float = 0.3,
) -> np.ndarray:
    """Render one frame with the reference oracle chain + f64 compositing.

    Reference calls: _quat_scale_to_covar_preci (covariance),
    _fully_fused_projection (EWA + eps2d blur), _eval_sh_bases_fast via
    _spherical_harmonics (with the +0.5 offset of rendering.py:525),
    _isect_tiles / _isect_offset_encode (bit-packed key encoding + stable
    sort). Returns [height, width, 3] float64."""
    import torch

    from tdgs.utils.golden import compose_reference_f64

    REF = _load()
    t = lambda x: torch.from_numpy(np.asarray(x, np.float32))  # noqa: E731

    covars, _ = REF._quat_scale_to_covar_preci(
        t(quats), t(scales), compute_preci=False, triu=False
    )
    viewmats = t(viewmat)[None]
    Ks = t(K)[None]
    radii, means2d, depths, conics, _ = REF._fully_fused_projection(
        t(means), covars, viewmats, Ks, width, height, eps2d=eps2d
    )

    # SH along reference conventions (dirs from camera center, masked to
    # visible, +0.5 clamp — reference rendering.py:489-525)
    R = np.asarray(viewmat)[:3, :3]
    tvec = np.asarray(viewmat)[:3, 3]
    campos = -R.T @ tvec
    dirs = t(np.asarray(means) - campos[None])[None]
    masks = (radii > 0).all(-1)
    cols = REF._spherical_harmonics(
        sh_degree, dirs, t(sh)[None].expand(1, -1, -1, -1)
    )
    cols = torch.clamp_min(cols + 0.5, 0.0)
    cols = torch.where(masks[..., None], cols, torch.zeros(()))

    tile_width = (width + tile_size - 1) // tile_size
    tile_height = (height + tile_size - 1) // tile_size
    _, isect_ids, flatten_ids = REF._isect_tiles(
        means2d, radii, depths, tile_size, tile_width, tile_height
    )
    offsets = REF._isect_offset_encode(isect_ids, 1, tile_width, tile_height)

    img = compose_reference_f64(
        offsets.numpy(),
        flatten_ids.numpy(),
        means2d.reshape(-1, 2).numpy(),
        conics.reshape(-1, 3).numpy(),
        cols.reshape(-1, 3).numpy(),
        np.broadcast_to(np.asarray(opacities, np.float64)[None], masks.shape)
        .reshape(-1),
        width, height, tile_size, tile_width, tile_height,
        background=background,
        n_isects=int(flatten_ids.shape[0]),
    )
    return img
