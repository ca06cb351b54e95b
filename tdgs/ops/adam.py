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


class SelectiveAdam:
    """Stateful wrapper matching the reference optimizer's name and
    ``step(visibility)`` shape (gsplat/optimizers/selective_adam.py:6-86).

    JAX training loops should use the functional :func:`selective_adam`
    transformation above (jit-friendly; the trainer does). This class holds
    params + moments for script-style use, mirroring the torch optimizer:

        opt = SelectiveAdam(params, lr=1e-3, eps=1e-8, betas=(0.9, 0.999))
        params = opt.step(grads, visibility=vis_mask)

    ``lr`` may be a scalar or a dict keyed like ``params`` (the analog of
    the reference's per-group learning rates). Like the CUDA kernel, there
    is no bias correction, and masked-out rows keep both moments and value.
    """

    def __init__(self, params, lr=1e-3, eps: float = 1e-8,
                 betas=(0.9, 0.999)):
        self.params = params
        self.lr = lr
        self.eps = eps
        self.b1, self.b2 = betas
        self.exp_avg = jax.tree.map(jnp.zeros_like, params)
        self.exp_avg_sq = jax.tree.map(jnp.zeros_like, params)

    def step(self, grads, visibility: Optional[jnp.ndarray] = None):
        def upd(path_lr, p, g, m, v):
            m_new = self.b1 * m + (1.0 - self.b1) * g
            v_new = self.b2 * v + (1.0 - self.b2) * g * g
            p_new = p - path_lr * m_new / (jnp.sqrt(v_new) + self.eps)
            if visibility is not None:
                vis = visibility.reshape(
                    visibility.shape + (1,) * (g.ndim - 1)
                )
                p_new = jnp.where(vis, p_new, p)
                m_new = jnp.where(vis, m_new, m)
                v_new = jnp.where(vis, v_new, v)
            return p_new, m_new, v_new

        if isinstance(self.lr, dict):
            assert isinstance(self.params, dict), "dict lr needs dict params"
            out = {
                k: upd(self.lr[k], self.params[k], grads[k],
                       self.exp_avg[k], self.exp_avg_sq[k])
                for k in self.params
            }
            self.params = {k: o[0] for k, o in out.items()}
            self.exp_avg = {k: o[1] for k, o in out.items()}
            self.exp_avg_sq = {k: o[2] for k, o in out.items()}
        else:
            flat_p, tree = jax.tree.flatten(self.params)
            flat_g = tree.flatten_up_to(grads)
            flat_m = tree.flatten_up_to(self.exp_avg)
            flat_v = tree.flatten_up_to(self.exp_avg_sq)
            out = [upd(self.lr, p, g, m, v)
                   for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
            self.params = tree.unflatten([o[0] for o in out])
            self.exp_avg = tree.unflatten([o[1] for o in out])
            self.exp_avg_sq = tree.unflatten([o[2] for o in out])
        return self.params
