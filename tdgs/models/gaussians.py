"""Splat parameter pytree + initializers.

Replaces the reference's ``create_splats_with_optimizers``
(examples/simple_trainer.py:258-357) and the ``torch.nn.ParameterDict``
convention. TPU-first deltas:

- Parameters live in a plain dict pytree (``SplatParams`` is an alias) so it
  jits/shards/checkpoints with no framework ceremony.
- Capacity is static: ``n_max`` (densification works on masks, not reshapes;
  see tdgs/strategy/). Dead slots carry opacity logit ``DEAD_OPACITY_LOGIT``
  (σ(x) < 1/255 ⇒ culled by the projection's opacity threshold).
- Raw parametrization identical to the reference: log-scales, logit
  opacities, unnormalized wxyz quats, SH split into dc ``sh0`` [N,1,3] and
  rest ``shN`` [N,K-1,3].
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

SplatParams = Dict[str, jnp.ndarray]

# sigmoid(-7) ≈ 9.1e-4 < 1/255: a dead gaussian is culled at projection.
DEAD_OPACITY_LOGIT = -7.0


def num_sh_coeffs(sh_degree: int) -> int:
    return (sh_degree + 1) ** 2


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Invert the SH dc band rendering convention color = 0.2821·dc + 0.5
    (reference: examples/utils.py:rgb_to_sh)."""
    return (rgb - 0.5) / 0.2820947917738781


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * 0.2820947917738781 + 0.5


def knn_mean_dist(points: jnp.ndarray, k: int = 3, chunk: int = 1024) -> jnp.ndarray:
    """Mean distance to the k nearest neighbors (excluding self), used for
    scale init (reference: simple_trainer.py:293-296 via sklearn kNN).
    Pure-jnp chunked O(N²) — fine up to a few hundred thousand points."""
    n = points.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pts_pad = jnp.pad(points, ((0, n_pad - n), (0, 0)), constant_values=jnp.inf)

    def body(block):
        d2 = jnp.sum((block[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        # k+1 smallest includes self (distance 0)
        neg_top, _ = jax.lax.top_k(-d2, k + 1)
        return jnp.sqrt(jnp.maximum(-neg_top[:, 1:], 0.0)).mean(axis=-1)

    blocks = pts_pad.reshape(n_pad // chunk, chunk, points.shape[-1])
    out = jax.lax.map(body, blocks).reshape(n_pad)
    return out[:n]


def create_splats(
    points: jnp.ndarray,  # [M, 3] SfM points or other init positions
    rgbs: Optional[jnp.ndarray],  # [M, 3] in [0,1], or None → random
    key: jax.Array,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    init_scale_mult: float = 1.0,
    n_max: Optional[int] = None,
    identity_dim: int = 0,
    feature_dim: int = 0,
    means_lr_scene_scale: float = 1.0,
) -> SplatParams:
    """Initialize splats from points (SfM init), padding to static ``n_max``.

    Mirrors the reference init: scales = log(mean 3-NN distance · mult),
    opacities = logit(init_opacity), quats random, sh0 from RGB
    (simple_trainer.py:258-338).
    """
    m = points.shape[0]
    n_max = n_max or m
    assert n_max >= m
    k_quat, k_rgb = jax.random.split(key)

    dist = knn_mean_dist(points, k=3)
    scales = jnp.log(jnp.maximum(dist * init_scale_mult, 1e-7))[:, None].repeat(3, 1)

    if rgbs is None:
        rgbs = jax.random.uniform(k_rgb, (m, 3))

    quats = jax.random.normal(k_quat, (m, 4)) * 0.1 + jnp.array([1.0, 0, 0, 0])
    opacities = jnp.full((m,), _logit(init_opacity))
    K = num_sh_coeffs(sh_degree)
    sh0 = rgb_to_sh(rgbs)[:, None, :]
    shN = jnp.zeros((m, K - 1, 3))

    params: SplatParams = {
        "means": points.astype(jnp.float32),
        "quats": quats.astype(jnp.float32),
        "scales": scales.astype(jnp.float32),
        "opacities": opacities.astype(jnp.float32),
        "sh0": sh0.astype(jnp.float32),
        "shN": shN.astype(jnp.float32),
    }
    if identity_dim > 0:
        # learnable per-gaussian identity vectors for segmentation
        # (reference: simple_trainer.py:315-319)
        params["identity_encodings"] = (
            jax.random.normal(k_rgb, (m, identity_dim)) * 0.1
        ).astype(jnp.float32)
    if feature_dim > 0:
        # appearance-optimization mode (reference simple_trainer.py:321-330):
        # per-gaussian feature vectors + logit base colors consumed by the
        # AppearanceOptModule instead of SH
        params["features"] = jax.random.uniform(
            k_quat, (m, feature_dim)
        ).astype(jnp.float32)
        params["colors"] = jnp.log(
            jnp.clip(rgbs, 1e-4, 1 - 1e-4) / (1 - jnp.clip(rgbs, 1e-4, 1 - 1e-4))
        ).astype(jnp.float32)

    if n_max > m:
        params = pad_splats(params, n_max)
    return params


def create_splats_random(
    key: jax.Array,
    n: int,
    scene_scale: float = 1.0,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    n_max: Optional[int] = None,
    identity_dim: int = 0,
) -> SplatParams:
    """Random-position init (reference's init_type="random",
    simple_trainer.py:276-282): uniform in [-scene_scale, scene_scale]³."""
    k_pts, k_rest = jax.random.split(key)
    points = jax.random.uniform(k_pts, (n, 3), minval=-scene_scale, maxval=scene_scale)
    return create_splats(
        points,
        None,
        k_rest,
        sh_degree=sh_degree,
        init_opacity=init_opacity,
        n_max=n_max,
        identity_dim=identity_dim,
    )


def pad_splats(params: SplatParams, n_max: int) -> SplatParams:
    """Pad every leaf to capacity n_max; padded slots are dead (opacity
    logit DEAD_OPACITY_LOGIT, tiny scales)."""
    n = params["means"].shape[0]
    pad = n_max - n
    assert pad >= 0
    if pad == 0:
        return params
    out = {}
    for name, p in params.items():
        padding = [(0, pad)] + [(0, 0)] * (p.ndim - 1)
        if name == "opacities":
            out[name] = jnp.pad(p, padding, constant_values=DEAD_OPACITY_LOGIT)
        elif name == "scales":
            out[name] = jnp.pad(p, padding, constant_values=-10.0)
        elif name == "quats":
            q = jnp.zeros((pad, 4), p.dtype).at[:, 0].set(1.0)
            out[name] = jnp.concatenate([p, q], axis=0)
        else:
            out[name] = jnp.pad(p, padding)
    return out


def alive_mask(params: SplatParams) -> jnp.ndarray:
    """Gaussians whose opacity clears the render threshold."""
    return jax.nn.sigmoid(params["opacities"]) >= (1.0 / 255.0)


def splat_activations(
    params: SplatParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Raw params → render inputs: (means, quats, exp(scales),
    sigmoid(opacities), sh [N, K, 3]). Matches the reference activations
    (simple_trainer.py:rasterize_splats:559-577)."""
    means = params["means"]
    quats = params["quats"]  # normalization happens inside quat_to_rotmat
    scales = jnp.exp(params["scales"])
    opacities = jax.nn.sigmoid(params["opacities"])
    sh = jnp.concatenate([params["sh0"], params["shN"]], axis=-2)
    return means, quats, scales, opacities, sh


def _logit(x: float) -> float:
    return math.log(x / (1.0 - x))
