"""Default 3DGS densification strategy at fixed capacity.

Behavior parity with the reference's DefaultStrategy
(gsplat/strategy/default.py, original 3DGS paper heuristics): accumulate
pixel-normalized screen-space positional gradients per gaussian, then
periodically duplicate (high grad, small), split (high grad, large), prune
(low opacity / too large), and reset opacities.

TPU redesign: arrays never grow — duplicates/splits are scattered into dead
slots of the pre-allocated capacity (SURVEY.md §7 delta 1). The trainer
supplies per-step screen gradients via an explicit means2d tap (see
tdgs/training/trainer.py) instead of torch's ``.retain_grad()``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tdgs.models.gaussians import SplatParams
from tdgs.strategy.base import Strategy
from tdgs.strategy.ops import grow_and_prune_default, reset_opacities


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _update_state_jit(grad2d, count, radii_norm, v_means2d, radii, width, height,
                      tile_max):
    """Accumulate screen-grad norms (pixel units) and visibility counts.

    v_means2d: [..., C, N, 2] gradient of the loss w.r.t. projected means.
    radii: [..., C, N, 2]. Normalization matches the reference
    (_update_state:203-260): grads scaled by image size / 2.
    """
    g = v_means2d * jnp.stack(
        [width / 2.0, height / 2.0]
    ).astype(v_means2d.dtype)
    gnorm = jnp.linalg.norm(g, axis=-1)  # [..., C, N]
    visible = (radii > 0).all(axis=-1)
    lead = tuple(range(gnorm.ndim - 1))
    grad2d = grad2d + jnp.sum(jnp.where(visible, gnorm, 0.0), axis=lead)
    count = count + jnp.sum(visible, axis=lead).astype(count.dtype)
    r = jnp.max(radii, axis=-1) / tile_max  # normalized by image max-dim
    radii_norm = jnp.maximum(radii_norm, jnp.max(r, axis=lead).astype(radii_norm.dtype))
    return grad2d, count, radii_norm


@dataclass
class DefaultStrategy(Strategy):
    prune_opa: float = 0.005
    grow_grad2d: float = 0.0002
    grow_scale3d: float = 0.01
    grow_scale2d: float = 0.05
    prune_scale3d: float = 0.1
    prune_scale2d: float = 0.15
    refine_scale2d_stop_iter: int = 0
    refine_start_iter: int = 500
    refine_stop_iter: int = 15_000
    reset_every: int = 3000
    refine_every: int = 100
    pause_refine_after_reset: int = 0
    absgrad: bool = False
    revised_opacity: bool = False
    verbose: bool = False

    def initialize_state(self, params: SplatParams, scene_scale: float = 1.0) -> Dict:
        C = params["means"].shape[0]
        return {
            "grad2d": jnp.zeros((C,), jnp.float32),
            "count": jnp.zeros((C,), jnp.float32),
            "radii_norm": jnp.zeros((C,), jnp.float32),
            "scene_scale": scene_scale,
        }

    def update_state(
        self,
        state: Dict,
        info: Dict,
        v_means2d: jnp.ndarray,
    ) -> Dict:
        """Call every step with the screen-space gradient of the loss w.r.t.
        meta['means2d'] (use the trainer's means2d tap; pass the absolute
        per-pixel-accumulated gradient when absgrad=True)."""
        grad2d, count, radii_norm = _update_state_jit(
            state["grad2d"], state["count"], state["radii_norm"],
            v_means2d, info["radii"],
            jnp.float32(info["width"]), jnp.float32(info["height"]),
            jnp.float32(max(info["width"], info["height"])),
        )
        return dict(state, grad2d=grad2d, count=count, radii_norm=radii_norm)

    def step_post_backward(
        self,
        params: SplatParams,
        opt_state: Any,
        state: Dict,
        step: int,
        info: Dict,
        key: jax.Array,
        lr: float = 0.0,
    ) -> Tuple[SplatParams, Any, Dict]:
        del lr
        if (
            self.refine_start_iter < step < self.refine_stop_iter
            and step % self.refine_every == 0
            and (
                self.pause_refine_after_reset == 0
                or step % self.reset_every >= self.pause_refine_after_reset
            )
        ):
            use_scale2d = 0 < self.refine_scale2d_stop_iter and (
                step < self.refine_scale2d_stop_iter
            )
            params, opt_state, ginfo = grow_and_prune_default(
                params,
                opt_state,
                key,
                state["grad2d"],
                state["count"],
                state["radii_norm"],
                state["scene_scale"],
                grow_grad2d=self.grow_grad2d,
                grow_scale3d=self.grow_scale3d,
                grow_scale2d=self.grow_scale2d,
                prune_opa=self.prune_opa,
                prune_scale3d=self.prune_scale3d,
                prune_scale2d=self.prune_scale2d,
                use_scale2d=use_scale2d,
                prune_too_big=step > self.reset_every,
                revised_opacity=self.revised_opacity,
            )
            if self.verbose:
                print(
                    f"Step {step}: dupli {int(ginfo['n_dupli'])} "
                    f"split {int(ginfo['n_split'])} prune {int(ginfo['n_prune'])} "
                    f"granted {int(ginfo['n_granted'])}"
                )
            C = params["means"].shape[0]
            state = dict(
                state,
                grad2d=jnp.zeros((C,), jnp.float32),
                count=jnp.zeros((C,), jnp.float32),
                radii_norm=jnp.zeros((C,), jnp.float32),
            )

        if step % self.reset_every == 0 and step > 0:
            params, opt_state = reset_opacities(
                params, opt_state, value=2.0 * self.prune_opa
            )
        return params, opt_state, state
