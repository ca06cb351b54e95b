"""Strategy interface (functional): params/opt_state in → params/opt_state out.

The reference mutates torch parameters in place
(gsplat/strategy/base.py); here strategies are pure functions over the
(params, opt_state, strategy_state) triple so they compose with jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax

from tdgs.models.gaussians import SplatParams


@dataclass
class Strategy:
    def check_sanity(self, params: SplatParams) -> None:
        for key in ("means", "scales", "quats", "opacities"):
            assert key in params, f"{key} is required in params but missing."

    def initialize_state(self, params: SplatParams, scene_scale: float = 1.0) -> Dict:
        raise NotImplementedError

    def step_pre_backward(self, state: Dict, step: int) -> Dict:
        return state

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
        raise NotImplementedError
