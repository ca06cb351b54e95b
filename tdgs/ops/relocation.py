"""MCMC relocation op (pure jnp).

Replaces the reference's relocation CUDA kernel
(gsplat/cuda/csrc/RelocationCUDA.cu:26-43, wrapper gsplat/relocation.py):
Eq. 9 of "3D Gaussian Splatting as MCMC" (arXiv:2404.09591) — when a
gaussian is cloned into n copies, the new opacity is 1-(1-o)^(1/n) and the
scale shrinks by o / Σᵢ Σₖ binom(i-1,k)·(-1)ᵏ·o_newᵏ⁺¹/√(k+1).

The CUDA double loop becomes one [N, n_max] × [n_max, n_max] matmul against
the precomputed binomial table plus a masked reduction — MXU-friendly and
vmappable.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

N_MAX = 51


def make_binoms(n_max: int = N_MAX) -> jnp.ndarray:
    """Binomial coefficient lookup table [n_max, n_max] (upper entries 0)."""
    b = np.zeros((n_max, n_max), dtype=np.float32)
    for n in range(n_max):
        for k in range(n + 1):
            b[n, k] = math.comb(n, k)
    return jnp.asarray(b)


def compute_relocation(
    opacities: jnp.ndarray,  # [N] post-sigmoid
    scales: jnp.ndarray,  # [N, 3] post-exp
    ratios: jnp.ndarray,  # [N] int: number of samples per gaussian
    binoms: jnp.ndarray,  # [n_max, n_max]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (new_opacities [N], new_scales [N, 3])."""
    n_max = binoms.shape[0]
    ratios = jnp.clip(ratios, 1, n_max).astype(jnp.int32)

    new_op = 1.0 - jnp.power(1.0 - opacities, 1.0 / ratios)

    # The CUDA double loop Σ_{i=1..n} Σ_{k=0..i-1} C(i-1,k)·(-1)^k·o^{k+1}/√(k+1)
    # collapses via the hockey-stick identity Σ_{i=1..n} C(i-1,k) = C(n,k+1)
    # to the single sum Σ_{j=1..n} C(n,j)·(-1)^{j+1}·o^j/√j.
    j = jnp.arange(1, n_max + 1, dtype=jnp.float32)  # [K]
    sign = jnp.where(jnp.arange(n_max) % 2 == 0, 1.0, -1.0)  # (-1)^{j+1}
    powers = jnp.power(new_op[:, None], j)  # [N, K]
    # C(n, j) for each gaussian's n: gather row `ratios` of the table
    cnj = binoms[ratios]  # [N, n_max] — column j-1 holds C(n, j-1)
    cnj = cnj[:, 1:]  # C(n, 1..n_max-1)
    cnj = jnp.pad(cnj, ((0, 0), (0, 1)))  # C(n, n_max) = 0 for n < n_max
    denom = jnp.sum(cnj * sign / jnp.sqrt(j) * powers, axis=1)

    coeff = opacities / jnp.where(denom == 0.0, 1.0, denom)
    new_scales = coeff[:, None] * scales
    return new_op, new_scales
