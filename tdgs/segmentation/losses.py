"""Contrastive Gaussian Clustering losses (pure jnp, static shapes).

Behavior parity with the fork's segmentation losses
(reference examples/utils.py):
- cgc_contrastive_clustering_loss (:828, ACTIVE in the training loop):
  vectorized CGC Eq. 3 — per-pixel normalized features vs mask-centroid
  logits with per-cluster self-temperature φ, cross-entropy.
- cgc_spatial_regularizer (:907, ACTIVE): sampled kNN near-pull / k-far push
  on per-gaussian features.
- contrastive_segmentation_loss (:744, unused in the final loop, kept for
  API parity): prototype intra-MSE + inter-cosine.
- cluster_quality (:789): intra/inter cluster distances for logging.

JAX redesign: torch.unique/dynamic id sets become a static ``max_instances``
bound with validity masks — instance ids are assumed to be small ints in
[0, max_instances).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _normalize(x, axis=-1, eps=1e-12):
    # sqrt(Σx²+ε) instead of norm: jnp.linalg.norm has a NaN gradient at 0,
    # and background pixels render exactly-zero feature vectors.
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def cgc_contrastive_clustering_loss(
    feature_map: jnp.ndarray,  # [H, W, D] rendered per-pixel features
    instance_mask: jnp.ndarray,  # [H, W] int ids, 0 = background
    max_instances: int = 64,
    min_cluster_size: int = 30,
    eps: float = 1e-6,
) -> jnp.ndarray:
    H, W, D = feature_map.shape
    feats = _normalize(feature_map.reshape(-1, D))  # [HW, D]
    ids = instance_mask.reshape(-1).astype(jnp.int32)  # [HW]
    ids = jnp.clip(ids, 0, max_instances - 1)

    counts = jnp.zeros((max_instances,)).at[ids].add(1.0)
    sums = jnp.zeros((max_instances, D)).at[ids].add(feats)
    valid = (jnp.arange(max_instances) != 0) & (counts >= min_cluster_size)
    n_valid = jnp.sum(valid)

    centroids = _normalize(sums / jnp.maximum(counts[:, None], 1.0))
    sims = feats @ centroids.T  # [HW, max_instances]

    pos = jnp.take_along_axis(sims, ids[:, None], axis=1)[:, 0]  # [HW]
    active = valid[ids]  # pixel belongs to a valid fg cluster
    sum_pos = jnp.zeros((max_instances,)).at[ids].add(
        jnp.where(active, pos, 0.0)
    )
    act_counts = jnp.zeros((max_instances,)).at[ids].add(active.astype(jnp.float32))
    phi = jnp.maximum(sum_pos / jnp.maximum(act_counts, 1.0), eps)

    logits = sims / jnp.maximum(phi[ids][:, None], eps)
    logits = jnp.where(valid[None, :], logits, -1e9)  # only valid clusters
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, ids[:, None], axis=1)[:, 0]
    loss = jnp.sum(jnp.where(active, nll, 0.0)) / jnp.maximum(
        jnp.sum(active), 1.0
    )
    return jnp.where(n_valid >= 2, loss, 0.0)


def cgc_spatial_regularizer(
    features: jnp.ndarray,  # [N, D] per-gaussian features
    positions: jnp.ndarray,  # [N, 3]
    key: jax.Array,
    num_samples: int = 8192,
    k_near: int = 2,
    k_far: int = 5,
    lambda_near: float = 0.05,
    lambda_far: float = 0.15,
) -> jnp.ndarray:
    N, D = features.shape
    if N < num_samples or N < (k_near + k_far + 1):
        num_samples = min(num_samples, N)
        if N < (k_near + k_far + 1):
            return jnp.zeros(())
    idx = jax.random.permutation(key, N)[:num_samples]
    f = _normalize(features[idx])
    p = positions[idx]

    d2 = jnp.sum((p[:, None, :] - p[None, :, :]) ** 2, axis=-1)
    d2 = jax.lax.stop_gradient(d2)
    # k_near+1 smallest (skip self), k_far largest
    _, near_idx = jax.lax.top_k(-d2, k_near + 1)
    near_idx = near_idx[:, 1:]
    _, far_idx = jax.lax.top_k(d2, k_far)

    sim = f @ f.T
    s = jnp.arange(num_samples)[:, None]
    near_sims = sim[s, near_idx]
    far_sims = sim[s, far_idx]
    loss_near = jnp.mean((1.0 - near_sims) ** 2)
    loss_far = jnp.mean(far_sims**2)
    return lambda_near * loss_near + lambda_far * loss_far


def contrastive_segmentation_loss(
    identity_map: jnp.ndarray,  # [H, W, D]
    instance_mask: jnp.ndarray,  # [H, W]
    max_instances: int = 64,
) -> jnp.ndarray:
    """Prototype intra-MSE + inter-cosine (reference utils.py:744; not used
    by the final training loop but part of the API surface)."""
    H, W, D = identity_map.shape
    feats = identity_map.reshape(-1, D)
    ids = jnp.clip(instance_mask.reshape(-1).astype(jnp.int32), 0, max_instances - 1)

    counts = jnp.zeros((max_instances,)).at[ids].add(1.0)
    sums = jnp.zeros((max_instances, D)).at[ids].add(feats)
    valid = (jnp.arange(max_instances) != 0) & (counts > 0)
    n_valid = jnp.sum(valid)
    protos = sums / jnp.maximum(counts[:, None], 1.0)

    # intra: mse of each fg pixel to its prototype, averaged per instance
    diff2 = jnp.sum((feats - protos[ids]) ** 2, axis=-1) / D
    active = valid[ids]
    per_inst = jnp.zeros((max_instances,)).at[ids].add(jnp.where(active, diff2, 0.0))
    intra = per_inst / jnp.maximum(counts, 1.0)
    intra_loss = jnp.sum(jnp.where(valid, intra, 0.0)) / jnp.maximum(n_valid, 1)

    # inter: off-diagonal cosine similarity pushed to -1 (…+1 → 0)
    pn = _normalize(protos)
    cs = pn @ pn.T
    eye = jnp.eye(max_instances)
    pair_valid = valid[:, None] & valid[None, :]
    term = (cs - eye + 1.0) ** 2
    inter_loss = jnp.sum(jnp.where(pair_valid, term, 0.0)) / jnp.maximum(
        jnp.sum(pair_valid), 1.0
    )
    return jnp.where(n_valid >= 2, intra_loss + inter_loss, 0.0)


def cluster_quality(
    identity_map: jnp.ndarray,  # [H, W, D]
    instance_mask: jnp.ndarray,  # [H, W]
    max_instances: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(avg intra-cluster distance, avg inter-centroid distance) for
    tensorboard logging (reference utils.py:log_cluster_quality:789)."""
    H, W, D = identity_map.shape
    feats = identity_map.reshape(-1, D)
    ids = jnp.clip(instance_mask.reshape(-1).astype(jnp.int32), 0, max_instances - 1)
    counts = jnp.zeros((max_instances,)).at[ids].add(1.0)
    sums = jnp.zeros((max_instances, D)).at[ids].add(feats)
    valid = (jnp.arange(max_instances) != 0) & (counts > 0)
    cents = sums / jnp.maximum(counts[:, None], 1.0)

    dist = jnp.linalg.norm(feats - cents[ids], axis=-1)
    active = valid[ids]
    per_inst = jnp.zeros((max_instances,)).at[ids].add(jnp.where(active, dist, 0.0))
    intra = jnp.sum(
        jnp.where(valid, per_inst / jnp.maximum(counts, 1.0), 0.0)
    ) / jnp.maximum(jnp.sum(valid), 1)

    pd = jnp.linalg.norm(cents[:, None, :] - cents[None, :, :], axis=-1)
    iu = jnp.triu(jnp.ones((max_instances, max_instances), bool), k=1)
    pair_valid = valid[:, None] & valid[None, :] & iu
    inter = jnp.sum(jnp.where(pair_valid, pd, 0.0)) / jnp.maximum(
        jnp.sum(pair_valid), 1
    )
    return intra, inter
