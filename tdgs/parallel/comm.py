"""Collective-communication helpers (parity with gsplat/distributed.py).

The reference wraps torch.distributed/NCCL with functions that handle
variable-length tensor lists and differentiable collectives
(all_gather_int32 :10, all_to_all_int32 :55, all_gather_tensor_list :102,
all_to_all_tensor_list :170, cli launcher :304).

On TPU these reduce to jax.lax collectives inside shard_map — which are
differentiable by construction, need no launcher (single-controller JAX),
and handle the "variable length" problem with static per-device capacities.
These wrappers exist for API parity and for code that wants the collective
without writing the shard_map plumbing. All must be called INSIDE a
shard_map region with the given axis name.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def world_size(axis_name: str = "gauss") -> int:
    return jax.lax.axis_size(axis_name)


def world_rank(axis_name: str = "gauss") -> jnp.ndarray:
    return jax.lax.axis_index(axis_name)


def all_gather(x: jnp.ndarray, axis_name: str = "gauss") -> jnp.ndarray:
    """Concatenate every device's shard along axis 0
    (reference all_gather_int32/all_gather_tensor_list)."""
    return jax.lax.all_gather(x, axis_name, tiled=True)


def all_to_all(
    x: jnp.ndarray,
    axis_name: str = "gauss",
    split_axis: int = 0,
    concat_axis: int = 0,
) -> jnp.ndarray:
    """Exchange equal splits between devices
    (reference all_to_all_int32/all_to_all_tensor_list, without the
    variable-length negotiation — capacities are static on TPU)."""
    return jax.lax.all_to_all(
        x, axis_name, split_axis=split_axis, concat_axis=concat_axis, tiled=True
    )


def all_reduce_sum(x: jnp.ndarray, axis_name: str = "gauss") -> jnp.ndarray:
    return jax.lax.psum(x, axis_name)


def all_gather_tensor_list(
    tensors: Sequence[jnp.ndarray], axis_name: str = "gauss"
) -> List[jnp.ndarray]:
    return [all_gather(t, axis_name) for t in tensors]


def all_to_all_tensor_list(
    tensors: Sequence[jnp.ndarray],
    axis_name: str = "gauss",
    split_axis: int = 0,
    concat_axis: int = 0,
) -> List[jnp.ndarray]:
    return [all_to_all(t, axis_name, split_axis, concat_axis) for t in tensors]
