"""Clustering identity encodings into object groups.

Capability parity with the fork's clustering CLI
(reference examples/load_identity_encodings.py):
- kmeans_identity_encodings_background (:387, the main path): anchor
  centroids from the rendered identity map × instance mask, K-means with
  n_init=1 from those anchors, 95th-percentile distance outliers →
  background, save cluster_groups npz.
- dbscan_identity_encodings (:191): eps sweep targeting a cluster count
  (sklearn on host).

K-means itself is jit-compiled jnp (Lloyd's iterations as one lax.scan) —
clustering a million 16-D encodings is a trivial MXU workload.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


@functools.partial(jax.jit, static_argnames=("iters",))
def kmeans(
    X: jnp.ndarray,  # [N, D]
    init_centroids: jnp.ndarray,  # [K, D]
    iters: int = 50,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd's K-means from fixed anchors (n_init=1). Returns
    (labels [N], centroids [K, D])."""

    def step(cents, _):
        d2 = (
            jnp.sum(X**2, axis=1, keepdims=True)
            - 2.0 * X @ cents.T
            + jnp.sum(cents**2, axis=1)[None, :]
        )
        labels = jnp.argmin(d2, axis=1)
        K = cents.shape[0]
        sums = jnp.zeros_like(cents).at[labels].add(X)
        counts = jnp.zeros((K,)).at[labels].add(1.0)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), cents)
        return new, None

    cents, _ = jax.lax.scan(step, init_centroids, None, length=iters)
    d2 = (
        jnp.sum(X**2, axis=1, keepdims=True)
        - 2.0 * X @ cents.T
        + jnp.sum(cents**2, axis=1)[None, :]
    )
    labels = jnp.argmin(d2, axis=1)
    return labels, cents


def anchor_centroids_from_identity_map(
    identity_map: np.ndarray,  # [H, W, D]
    instance_mask: np.ndarray,  # [H, W] int ids, 0 = background
) -> Tuple[np.ndarray, np.ndarray]:
    """Normalized mean identity-map feature per foreground mask id
    (reference :412-427). Returns (anchors [K, D], fg_ids [K])."""
    ids = np.unique(instance_mask)
    ids = ids[ids != 0]
    anchors = []
    for i in ids:
        f = identity_map[instance_mask == i]
        m = f.mean(axis=0)
        anchors.append(m / max(np.linalg.norm(m), 1e-12))
    return np.stack(anchors), ids


def kmeans_identity_encodings_background(
    identity_map: np.ndarray,  # [H, W, D] rendered identity features
    instance_mask: np.ndarray,  # [H, W]
    encodings: np.ndarray,  # [N, D] per-gaussian features to cluster
    outlier_percentile: float = 95.0,
    iters: int = 50,
) -> Dict[str, np.ndarray]:
    """Main clustering path (reference :387-476). Returns a dict with
    'labels' [N] (−1 = background/outlier), 'centroids' [K, D],
    'fg_ids' [K] (the mask ids the clusters correspond to)."""
    anchors, fg_ids = anchor_centroids_from_identity_map(
        identity_map, instance_mask
    )
    feats = np.asarray(_normalize(jnp.asarray(encodings)))
    labels, cents = kmeans(jnp.asarray(feats), jnp.asarray(anchors), iters=iters)
    labels = np.asarray(labels)
    cents = np.asarray(cents)

    dist = np.linalg.norm(feats - cents[labels], axis=-1)
    thresh = np.percentile(dist, outlier_percentile)
    out = labels.copy()
    out[dist > thresh] = -1
    return {"labels": out, "centroids": cents, "fg_ids": fg_ids}


def dbscan_identity_encodings(
    encodings: np.ndarray,  # [N, D]
    target_clusters: int = 3,
    eps_values: Optional[np.ndarray] = None,
    min_samples: int = 10,
) -> Dict[str, np.ndarray]:
    """DBSCAN eps sweep targeting a cluster count (reference :191-276).
    Uses sklearn on host (clustering is offline)."""
    from sklearn.cluster import DBSCAN

    feats = np.asarray(_normalize(jnp.asarray(encodings)))
    if eps_values is None:
        eps_values = np.linspace(0.05, 1.0, 20)
    best = None
    for eps in eps_values:
        labels = DBSCAN(eps=float(eps), min_samples=min_samples).fit_predict(feats)
        n = len(set(labels.tolist()) - {-1})
        if best is None or abs(n - target_clusters) < abs(best[1] - target_clusters):
            best = (labels, n, eps)
        if n == target_clusters:
            break
    labels, n, eps = best
    return {"labels": labels, "n_clusters": n, "eps": eps}


def save_cluster_groups(path: str, result: Dict[str, np.ndarray]) -> None:
    """Persist cluster groups (reference :566-569 cluster_groups.npy npz):
    one integer array of gaussian indices per cluster key."""
    groups = {}
    labels = result["labels"]
    for c in np.unique(labels):
        if c < 0:
            groups["background"] = np.where(labels < 0)[0]
        else:
            groups[str(int(c))] = np.where(labels == c)[0]
    np.savez(path, **groups)


def load_cluster_groups(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
