"""MCMC densification strategy (fixed capacity — the TPU default).

Behavior parity with the reference's MCMCStrategy (gsplat/strategy/mcmc.py,
"3D Gaussian Splatting as MCMC", arXiv:2404.09591):

- every ``refine_every`` steps in (refine_start, refine_stop): teleport
  dead gaussians onto opacity-sampled live ones and grow the live set by 5%
  up to ``cap_max`` (here: the static array capacity),
- every step: inject covariance-shaped position noise scaled by
  ``lr · noise_lr`` and gated by low opacity.

The parameter arrays are allocated at ``cap_max`` rows up front; the live
count is a host-side integer in the strategy state (refines happen every
100 steps, so the host sync is negligible).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from tdgs.models.gaussians import SplatParams
from tdgs.ops.relocation import make_binoms
from tdgs.strategy.base import Strategy
from tdgs.strategy.ops import inject_noise_to_position, refine_mcmc


@partial(jax.jit, donate_argnums=(0, 1), static_argnames=("min_opacity",))
def _refine_jit(params, opt_state, key, n_before, n_target, binoms, min_opacity):
    return refine_mcmc(
        params, opt_state, key, n_before, n_target, binoms, min_opacity
    )


@partial(jax.jit, donate_argnums=(0,))
def _noise_jit(params, key, scaler, n_alive):
    active = jnp.arange(params["means"].shape[0]) < n_alive
    return inject_noise_to_position(params, key, scaler, active_mask=active)


@dataclass
class MCMCStrategy(Strategy):
    cap_max: int = 1_000_000
    noise_lr: float = 5e5
    refine_start_iter: int = 500
    refine_stop_iter: int = 25_000
    refine_every: int = 100
    min_opacity: float = 0.005
    verbose: bool = False

    def initialize_state(self, params: SplatParams, scene_scale: float = 1.0,
                         n_alive: int | None = None) -> Dict:
        C = params["means"].shape[0]
        assert C <= self.cap_max or C == self.cap_max, (
            f"allocate params at cap_max rows (got {C}, cap_max {self.cap_max})"
        )
        if n_alive is None:
            import numpy as np

            n_alive = int(
                np.asarray(jax.nn.sigmoid(params["opacities"]) > self.min_opacity).sum()
            )
        return {"binoms": make_binoms(), "n_alive": n_alive}

    def step_post_backward(
        self,
        params: SplatParams,
        opt_state: Any,
        state: Dict,
        step: int,
        info: Dict,
        key: jax.Array,
        lr: float,
    ) -> Tuple[SplatParams, Any, Dict]:
        C = params["means"].shape[0]
        k_refine, k_noise = jax.random.split(key)

        if (
            self.refine_start_iter < step < self.refine_stop_iter
            and step % self.refine_every == 0
        ):
            n_before = state["n_alive"]
            n_target = min(C, int(1.05 * n_before))
            params, opt_state, n_reloc = _refine_jit(
                params,
                opt_state,
                k_refine,
                jnp.int32(n_before),
                jnp.int32(n_target),
                state["binoms"],
                self.min_opacity,
            )
            state = dict(state, n_alive=n_target)
            if self.verbose:
                print(
                    f"Step {step}: relocated {int(n_reloc)} GSs; "
                    f"now {n_target} live GSs."
                )

        params = _noise_jit(
            params, k_noise, jnp.float32(lr * self.noise_lr),
            jnp.int32(state["n_alive"]),
        )
        return params, opt_state, state
