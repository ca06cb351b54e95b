"""Training metrics logging: JSONL always, TensorBoard events when available.

The reference logs scalars through torch.utils.tensorboard
(examples/simple_trainer.py:387 SummaryWriter; :1015-1036 train/loss,
train/l1loss, train/ssimloss, train/depthloss, train/num_GS, train/mem,
cluster quality via examples/utils.py:789-825). Here the canonical sink is
``{result_dir}/metrics.jsonl`` — one JSON object per logged step, machine-
readable without any dependency — mirrored into TensorBoard event files
(under ``{result_dir}/tb``) when torch's SummaryWriter can be imported, so
``tensorboard --logdir`` works exactly like the reference.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    """Append-only scalar logger with an optional TensorBoard mirror."""

    def __init__(self, result_dir: str, use_tensorboard: bool = True):
        os.makedirs(result_dir, exist_ok=True)
        self._path = os.path.join(result_dir, "metrics.jsonl")
        self._f = open(self._path, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    log_dir=os.path.join(result_dir, "tb")
                )
            except Exception:
                self._tb = None  # torch unavailable → JSONL only

    @property
    def path(self) -> str:
        return self._path

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            if v is None:
                continue
            rec[k] = float(v)
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k in ("step", "time"):
                    continue
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def device_mem_gb() -> Optional[float]:
    """Peak device memory in GiB (reference logs CUDA max_memory in GB)."""
    from tdgs.utils.profiler import device_memory_stats

    stats = device_memory_stats()
    if not stats:
        return None
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
    return None if peak is None else peak / (1 << 30)
