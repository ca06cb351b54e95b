"""Spherical-harmonics color evaluation (pure jnp, degrees 0–4).

Replaces the reference's SH CUDA kernels
(gsplat/cuda/csrc/SphericalHarmonicsCUDA.cu, oracle
gsplat/cuda/_torch_impl.py:_eval_sh_bases_fast), using the standard
hard-coded real-SH basis polynomials from Sloan, "Efficient Spherical
Harmonic Evaluation", JCGT 2013. The backward pass (v_coeffs, v_dirs) comes
from JAX autodiff for free.

TPU note: the final contraction (bases · coeffs) is a small per-gaussian
reduction over K ≤ 25 bases; XLA fuses it with the basis evaluation into one
elementwise pass, so no custom kernel is warranted.
"""

from __future__ import annotations

import jax.numpy as jnp

# Real SH normalization constants (Sloan 2013, published closed forms).
_C0 = 0.2820947917738781


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh_bases(basis_dim: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the first ``basis_dim`` real SH bases at unit directions.

    dirs: [..., 3] unit vectors. Returns [..., basis_dim].
    basis_dim must be a square number in {1, 4, 9, 16, 25}.
    """
    if basis_dim not in (1, 4, 9, 16, 25):
        raise ValueError(f"basis_dim must be in (1,4,9,16,25), got {basis_dim}")

    out = [jnp.full(dirs.shape[:-1], _C0, dtype=dirs.dtype)]
    if basis_dim <= 1:
        return jnp.stack(out, axis=-1)

    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]

    tmp_a = -0.48860251190292
    out += [tmp_a * y, -tmp_a * z, tmp_a * x]  # l=1: m=-1, 0, +1
    if basis_dim <= 4:
        return jnp.stack(out, axis=-1)

    z2 = z * z
    tmp_b = -1.092548430592079 * z
    tmp_a2 = 0.5462742152960395
    c1 = x * x - y * y
    s1 = 2.0 * x * y
    out += [
        tmp_a2 * s1,                                  # m=-2
        tmp_b * y,                                    # m=-1
        0.9461746957575601 * z2 - 0.3153915652525201,  # m=0
        tmp_b * x,                                    # m=+1
        tmp_a2 * c1,                                  # m=+2
    ]
    if basis_dim <= 9:
        return jnp.stack(out, axis=-1)

    tmp_c = -2.285228997322329 * z2 + 0.4570457994644658
    tmp_b3 = 1.445305721320277 * z
    tmp_a3 = -0.5900435899266435
    c2 = x * c1 - y * s1
    s2 = x * s1 + y * c1
    out += [
        tmp_a3 * s2,
        tmp_b3 * s1,
        tmp_c * y,
        z * (1.865881662950577 * z2 - 1.119528997770346),
        tmp_c * x,
        tmp_b3 * c1,
        tmp_a3 * c2,
    ]
    if basis_dim <= 16:
        return jnp.stack(out, axis=-1)

    tmp_d = z * (-4.683325804901025 * z2 + 2.007139630671868)
    tmp_c4 = 3.31161143515146 * z2 - 0.47308734787878
    tmp_b4 = -1.770130769779931 * z
    tmp_a4 = 0.6258357354491763
    c3 = x * c2 - y * s2
    s3 = x * s2 + y * c2
    out += [
        tmp_a4 * s3,
        tmp_b4 * s2,
        tmp_c4 * s1,
        tmp_d * y,
        1.984313483298443 * z2 * (1.865881662950577 * z2 - 1.119528997770346)
        - 1.006230589874905 * (0.9461746957575601 * z2 - 0.3153915652525201),
        tmp_d * x,
        tmp_c4 * c1,
        tmp_b4 * c2,
        tmp_a4 * c3,
    ]
    return jnp.stack(out, axis=-1)


def spherical_harmonics(
    degrees_to_use: int,
    dirs: jnp.ndarray,  # [..., 3]
    coeffs: jnp.ndarray,  # [..., K, 3]
    masks: jnp.ndarray | None = None,  # [...], bool
) -> jnp.ndarray:
    """Evaluate SH color at view directions.

    API parity with the reference wrapper (gsplat/cuda/_wrapper.py:151):
    only the first (degrees_to_use+1)^2 of the K coefficient bands are
    active; ``masks`` zeroes out entire gaussians (invisible ones) so their
    coefficients get no gradient.
    """
    K = coeffs.shape[-2]
    num_bases = num_sh_bases(degrees_to_use)
    if num_bases > K:
        raise ValueError(f"degree {degrees_to_use} needs {num_bases} bases > K={K}")
    norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs / jnp.maximum(norm, 1e-12)
    bases = eval_sh_bases(num_bases, dirs)  # [..., num_bases]
    if num_bases < K:
        bases = jnp.pad(bases, [(0, 0)] * (bases.ndim - 1) + [(0, K - num_bases)])
    colors = jnp.einsum("...k,...kc->...c", bases, coeffs, precision="highest")
    if masks is not None:
        colors = jnp.where(masks[..., None], colors, 0.0)
    return colors
