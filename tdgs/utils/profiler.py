"""Profiling utilities (parity with gsplat/profile.py).

- ``timeit``: decorator/context gated by env TIMEIT=1, accumulating wall
  times into the global ``profiler`` dict. Where the reference fences with
  torch.cuda.synchronize, TPU timing forces a small host readback —
  block_until_ready alone can return early through remote-device tunnels.
- ``trace``: thin wrapper over jax.profiler.trace for XProf dumps.
"""

from __future__ import annotations

import functools
import os
import time
from contextlib import ContextDecorator
from typing import Dict, Optional

import jax
import numpy as np

profiler: Dict[str, float] = {}


def _sync(value=None):
    if value is not None:
        leaves = jax.tree.leaves(value)
        if leaves and hasattr(leaves[0], "ravel"):
            np.asarray(leaves[0].ravel()[:1])
            return
    # fall back: tiny device roundtrip
    np.asarray(jax.numpy.zeros(()))


class timeit(ContextDecorator):
    """Accumulate wall time under a name when TIMEIT=1 (else no-op)."""

    def __init__(self, name: str):
        self.name = name
        self.enabled = os.environ.get("TIMEIT", "0") == "1"

    def __enter__(self):
        if self.enabled:
            _sync()
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            _sync()
            profiler[self.name] = profiler.get(self.name, 0.0) + (
                time.perf_counter() - self.t0
            )
        return False


def reset() -> None:
    profiler.clear()


def summary() -> str:
    return "\n".join(f"{k}: {v*1000:.2f} ms" for k, v in sorted(profiler.items()))


def trace(log_dir: str):
    """Context manager: jax.profiler trace for XProf/TensorBoard."""
    return jax.profiler.trace(log_dir)


def device_memory_stats() -> Optional[Dict[str, int]]:
    """Live device memory stats (the reference logs CUDA max-memory)."""
    try:
        d = jax.devices()[0]
        return d.memory_stats()
    except Exception:
        return None
