"""Mesh construction helpers.

The reference launches one process per GPU with torch.multiprocessing and
NCCL process groups (gsplat/distributed.py:cli:304-360). On TPU there is no
launcher to write: single-controller JAX sees every chip; multi-host pods
just call jax.distributed.initialize() before building the same mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_name: str = "gauss",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over all (or given) devices for gaussian-sharded rendering."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def initialize_multihost() -> None:
    """Multi-host (pod) initialization; no-op when single-host."""
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process
