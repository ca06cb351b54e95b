"""Densification strategies at fixed capacity.

Replaces the reference's gsplat/strategy/ package (DefaultStrategy,
MCMCStrategy, ops). TPU redesign (SURVEY.md §7 delta 1): parameter arrays
never change shape — capacity is allocated up front and "growth"/"pruning"
activate/deactivate slots via the opacity mask that the projection stage
already culls on. MCMC (cap_max is inherently static) is the recommended
default on TPU.
"""

from tdgs.strategy.base import Strategy
from tdgs.strategy.mcmc import MCMCStrategy
from tdgs.strategy.default import DefaultStrategy
from tdgs.strategy.ops import (
    inject_noise_to_position,
    refine_mcmc,
    zero_opt_rows,
)

__all__ = [
    "Strategy",
    "MCMCStrategy",
    "DefaultStrategy",
    "inject_noise_to_position",
    "refine_mcmc",
    "zero_opt_rows",
]
