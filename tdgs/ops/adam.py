"""Selective Adam as an optax gradient transformation.

Replaces the reference's fused Adam CUDA kernel + SelectiveAdam optimizer
(gsplat/cuda/csrc/AdamCUDA.cu:26-46, gsplat/optimizers/selective_adam.py):
gaussians invisible in the current step (``visibility`` mask False) get
neither a moment update nor a parameter step. Matching the CUDA kernel,
there is **no bias correction**.

On TPU the masked dense update is the idiom — ``jnp.where`` fuses into the
update elementwise pass; no sparse/COO path is needed (SURVEY.md §7 delta 5).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax


class SelectiveAdamState(NamedTuple):
    count: jnp.ndarray  # [] int32 step counter (for lr schedules)
    exp_avg: optax.Params
    exp_avg_sq: optax.Params


def selective_adam(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformationExtraArgs:
    """Adam that skips updates for masked-out rows.

    The update fn accepts an extra ``visibility`` kwarg: a bool array whose
    leading dim matches each param's leading dim (per-gaussian), or None for
    a plain (uncorrected) Adam step.
    """

    def init_fn(params):
        return SelectiveAdamState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(jnp.zeros_like, params),
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None, *, visibility=None, **extra):
        del params, extra
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate

        def upd(g, m, v):
            m_new = b1 * m + (1.0 - b1) * g
            v_new = b2 * v + (1.0 - b2) * g * g
            step = -lr * m_new / (jnp.sqrt(v_new) + eps)
            if visibility is not None:
                vis = visibility.reshape(visibility.shape + (1,) * (g.ndim - 1))
                step = jnp.where(vis, step, 0.0)
                m_new = jnp.where(vis, m_new, m)
                v_new = jnp.where(vis, v_new, v)
            return step, m_new, v_new

        flat_u, tree = jax.tree.flatten(updates)
        flat_m = tree.flatten_up_to(state.exp_avg)
        flat_v = tree.flatten_up_to(state.exp_avg_sq)
        out = [upd(g, m, v) for g, m, v in zip(flat_u, flat_m, flat_v)]
        steps = tree.unflatten([o[0] for o in out])
        new_m = tree.unflatten([o[1] for o in out])
        new_v = tree.unflatten([o[2] for o in out])
        return steps, SelectiveAdamState(state.count + 1, new_m, new_v)

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)
