"""Gaussian splat model state: parameter pytrees, activations, initializers."""

from tdgs.models.gaussians import (
    SplatParams,
    create_splats,
    create_splats_random,
    splat_activations,
    num_sh_coeffs,
)

__all__ = [
    "SplatParams",
    "create_splats",
    "create_splats_random",
    "splat_activations",
    "num_sh_coeffs",
]
