"""Auxiliary trainable modules: camera pose + appearance optimization.

Functional (params dict + apply) counterparts of the reference's
CameraOptModule / AppearanceOptModule (examples/utils.py:15,54) with the
same math: per-image SE(3) deltas in 6D-rotation parametrization (Zhou et
al. 2019), and a per-image embedding + MLP over SH bases for appearance.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tdgs.ops.sh import eval_sh_bases, num_sh_bases


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation rep → rotation matrix via Gram-Schmidt (rows b1,b2,b3)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


# ---------------------------------------------------------------------------
# Camera pose optimization
# ---------------------------------------------------------------------------


def init_camera_opt(n_images: int, std: float = 0.0,
                    key: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Per-image pose deltas: 3 translation + 6D rotation, zero-initialized
    (or gaussian when std > 0 — the reference's pose-noise test mode)."""
    if std > 0.0 and key is not None:
        embeds = jax.random.normal(key, (n_images, 9)) * std
    else:
        embeds = jnp.zeros((n_images, 9))
    return {"embeds": embeds}


_IDENTITY_6D = jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])


def apply_camera_opt(
    params: Dict[str, jnp.ndarray],
    camtoworlds: jnp.ndarray,  # [..., 4, 4]
    embed_ids: jnp.ndarray,  # [...]
) -> jnp.ndarray:
    """camtoworlds ∘ exp(delta): right-multiplied local SE(3) correction."""
    deltas = params["embeds"][embed_ids]  # [..., 9]
    dx, drot = deltas[..., :3], deltas[..., 3:]
    rot = rotation_6d_to_matrix(drot + _IDENTITY_6D)
    batch = deltas.shape[:-1]
    transform = jnp.broadcast_to(jnp.eye(4), batch + (4, 4))
    transform = transform.at[..., :3, :3].set(rot)
    transform = transform.at[..., :3, 3].set(dx)
    return camtoworlds @ transform


def camera_opt_reg(params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """L2 regularizer on the pose deltas (simple_trainer.py pose_opt_reg)."""
    return jnp.mean(params["embeds"] ** 2)


# ---------------------------------------------------------------------------
# Appearance optimization
# ---------------------------------------------------------------------------


def init_appearance_opt(
    key: jax.Array,
    n_images: int,
    feature_dim: int,
    embed_dim: int = 16,
    sh_degree: int = 3,
    mlp_width: int = 64,
    mlp_depth: int = 2,
) -> Dict[str, jnp.ndarray]:
    in_dim = embed_dim + feature_dim + num_sh_bases(sh_degree)
    keys = jax.random.split(key, mlp_depth + 2)
    params: Dict[str, jnp.ndarray] = {
        "embeds": jnp.zeros((n_images, embed_dim)),
    }
    dims = [in_dim] + [mlp_width] * mlp_depth + [3]
    for i in range(len(dims) - 1):
        s = (2.0 / dims[i]) ** 0.5
        params[f"w{i}"] = jax.random.normal(keys[i], (dims[i], dims[i + 1])) * s
        params[f"b{i}"] = jnp.zeros((dims[i + 1],))
    # zero-init the color head so training starts from the base colors
    # (reference simple_trainer.py:501-502)
    last = len(dims) - 2
    params[f"w{last}"] = jnp.zeros_like(params[f"w{last}"])
    return params


def apply_appearance_opt(
    params: Dict[str, jnp.ndarray],
    features: jnp.ndarray,  # [N, feature_dim]
    embed_ids: Optional[jnp.ndarray],  # [C]
    dirs: jnp.ndarray,  # [C, N, 3]
    sh_degree: int,
    max_sh_degree: int = 3,
) -> jnp.ndarray:
    """Per-(camera, gaussian) colors [C, N, 3] from features + embedding +
    active SH bases of the view directions."""
    C, N = dirs.shape[:2]
    embed_dim = params["embeds"].shape[-1]
    if embed_ids is None:
        embeds = jnp.zeros((C, embed_dim))
    else:
        embeds = params["embeds"][embed_ids]
    embeds = jnp.broadcast_to(embeds[:, None, :], (C, N, embed_dim))
    feats = jnp.broadcast_to(features[None], (C, N, features.shape[-1]))
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    K = num_sh_bases(max_sh_degree)
    k_use = num_sh_bases(sh_degree)
    bases = eval_sh_bases(k_use, dirs)
    if k_use < K:
        bases = jnp.pad(bases, [(0, 0), (0, 0), (0, K - k_use)])
    h = jnp.concatenate([embeds, feats, bases], axis=-1)
    i = 0
    while f"w{i}" in params:
        h = h @ params[f"w{i}"] + params[f"b{i}"]
        if f"w{i+1}" in params:
            h = jax.nn.relu(h)
        i += 1
    return h
