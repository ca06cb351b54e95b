"""Normal-supervision losses (fork extensions, examples/utils.py:283-741).

The fork experiments with supervising per-gaussian normals against
monocular normal maps. Implemented here (pure jnp):
- calculate_gaussian_splat_normal_differentiable (:691): sharp-softmax
  selection of the smallest-scale axis + anisotropy confidence
- compute_normal_loss (:486): cosine / angular / combined / robust variants
- compute_progressive_normal_loss (:515): the active path (cosine, 2x)
- sample_normals_from_map (:283): bilinear sampling of a normal map at
  projected gaussian centers
- smooth_normals (:553): separable gaussian blur of a normal map
- depth smoothness / normal consistency regularizers (:1664-1741)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tdgs.ops.transforms import quat_to_rotmat


def _safe_normalize(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def calculate_gaussian_splat_normal_differentiable(
    quats: jnp.ndarray,  # [N, 4] or [N, 3, 3]
    scales: jnp.ndarray,  # [N, 3] post-activation
    opacities: Optional[jnp.ndarray] = None,  # [N]
    temperature: float = 0.01,
    sharpness: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable surfel normal: softmax-weighted rotation axis favoring
    the smallest scale, plus an anisotropy confidence. Returns
    (normals [N, 3], confidence [N])."""
    R = quat_to_rotmat(quats) if quats.shape[-1] == 4 else quats
    inv_scores = sharpness / (scales + 1e-8)
    weights = jax.nn.softmax(inv_scores / temperature, axis=1)  # [N, 3]
    normals = jnp.einsum("nij,nj->ni", R, weights)  # weighted axis columns
    normals = _safe_normalize(normals, axis=1)

    max_s = jnp.max(scales, axis=1)
    min_s = jnp.min(scales, axis=1)
    confidence = jnp.clip((max_s / (min_s + 1e-8) - 1.0) / 10.0, 0.0, 1.0)
    if opacities is not None:
        confidence = confidence * opacities
    return normals, confidence


def compute_normal_loss(
    gaussian_normals: jnp.ndarray,  # [..., 3]
    sampled_normals: jnp.ndarray,  # [..., 3]
    loss_type: str = "combined",
) -> jnp.ndarray:
    g = _safe_normalize(gaussian_normals)
    s = _safe_normalize(sampled_normals)
    cos = jnp.sum(g * s, axis=-1)
    if loss_type == "cosine":
        return (1.0 - cos).mean()
    if loss_type == "angular":
        c = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
        return jnp.arccos(jnp.abs(c)).mean()
    if loss_type == "combined":
        return 0.7 * (1.0 - cos).mean() + 0.3 * ((g - s) ** 2).mean()
    if loss_type == "robust":
        return jnp.sqrt(jnp.sum((g - s) ** 2, axis=-1) + 1e-8).mean()
    raise ValueError(loss_type)


def compute_progressive_normal_loss(
    gaussian_normals: jnp.ndarray,
    sampled_normals: jnp.ndarray,
    iteration: int = 0,
    max_iterations: int = 1,
    confidence: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The fork's active normal loss: cosine at weight 2.0 (the staged
    schedule in the reference is dead code behind an early return)."""
    del iteration, max_iterations, confidence
    return 2.0 * compute_normal_loss(
        gaussian_normals, sampled_normals, "cosine"
    )


def sample_normals_from_map(
    normal_map: jnp.ndarray,  # [H, W, 3]
    means2d: jnp.ndarray,  # [N, 2] pixel coords
) -> jnp.ndarray:
    """Bilinear sampling of per-pixel normals at projected gaussian centers
    (reference :283)."""
    H, W = normal_map.shape[:2]
    x = jnp.clip(means2d[:, 0] - 0.5, 0.0, W - 1.0)
    y = jnp.clip(means2d[:, 1] - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    top = normal_map[y0, x0] * (1 - fx) + normal_map[y0, x1] * fx
    bot = normal_map[y1, x0] * (1 - fx) + normal_map[y1, x1] * fx
    return top * (1 - fy) + bot * fy


def smooth_normals(normals: jnp.ndarray, kernel_size: int = 5) -> jnp.ndarray:
    """Separable gaussian blur of a normal map [H, W, 3] (reference :553)."""
    sigma = kernel_size / 6.0
    x = jnp.linspace(-3, 3, kernel_size)
    k = jnp.exp(-(x**2) / (2 * sigma**2))
    k = k / k.sum()
    img = normals[None].transpose(0, 3, 1, 2)  # [1, 3, H, W]
    B, C, H, W = img.shape
    img = img.reshape(B * C, 1, H, W)
    pad = kernel_size // 2
    img = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    img = jax.lax.conv_general_dilated(
        img, k.reshape(1, 1, kernel_size, 1), (1, 1), "VALID"
    )
    img = jax.lax.conv_general_dilated(
        img, k.reshape(1, 1, 1, kernel_size), (1, 1), "VALID"
    )
    return img.reshape(B, C, H, W).transpose(0, 2, 3, 1)[0]


def depth_smoothness_loss(depth: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware depth smoothness (reference :1664): depth gradients
    down-weighted where the image has edges."""
    dz_dx = jnp.abs(depth[:, 1:, :] - depth[:, :-1, :])
    dz_dy = jnp.abs(depth[1:, :, :] - depth[:-1, :, :])
    di_dx = jnp.mean(jnp.abs(image[:, 1:, :] - image[:, :-1, :]), -1, keepdims=True)
    di_dy = jnp.mean(jnp.abs(image[1:, :, :] - image[:-1, :, :]), -1, keepdims=True)
    return (
        jnp.mean(dz_dx * jnp.exp(-di_dx)) + jnp.mean(dz_dy * jnp.exp(-di_dy))
    )


def normal_consistency_loss(
    rendered_normals: jnp.ndarray,  # [H, W, 3]
    depth_normals: jnp.ndarray,  # [H, W, 3]
    alpha: Optional[jnp.ndarray] = None,  # [H, W, 1]
) -> jnp.ndarray:
    """1 − cos between rendered and depth-derived normals (reference :1711)."""
    n1 = _safe_normalize(rendered_normals)
    n2 = _safe_normalize(depth_normals)
    err = 1.0 - jnp.sum(n1 * n2, axis=-1)
    if alpha is not None:
        w = jax.lax.stop_gradient(alpha[..., 0])
        return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)
    return err.mean()


def render_normals_simple(
    normals: jnp.ndarray,  # [N, 3]
    means2d: jnp.ndarray,  # [N, 2]
    image_height: int,
    image_width: int,
) -> jnp.ndarray:
    """Point-splat normal visualization: place (n+1)/2 RGB at each
    gaussian's rounded center pixel (reference utils.py:1372-1402;
    returns [H, W, 3] instead of the torch [1, 3, H, W] layout)."""
    colors = (normals + 1.0) / 2.0
    px = jnp.round(means2d).astype(jnp.int32)
    valid = (
        (px[:, 0] >= 0) & (px[:, 0] < image_width)
        & (px[:, 1] >= 0) & (px[:, 1] < image_height)
    )
    # invalid rows scatter to a dead row (clipped coords, zero color)
    x = jnp.clip(px[:, 0], 0, image_width - 1)
    y = jnp.clip(px[:, 1], 0, image_height - 1)
    colors = jnp.where(valid[:, None], colors, 0.0)
    img = jnp.zeros((image_height, image_width, 3), colors.dtype)
    return img.at[y, x].set(colors)


def render_normals_with_interpolation(
    normals: jnp.ndarray,  # [N, 3]
    means2d: jnp.ndarray,  # [N, 2]
    image_height: int,
    image_width: int,
    kernel_size: int = 5,
) -> jnp.ndarray:
    """Normal visualization with hole-filling: box-blur the point splats,
    renormalized by the blurred coverage mask so sparse regions don't
    darken, then masked to the dilated footprint (reference
    utils.py:1403-1461). Returns [H, W, 3]."""
    img = render_normals_simple(normals, means2d, image_height, image_width)
    px = jnp.round(means2d).astype(jnp.int32)
    valid = (
        (px[:, 0] >= 0) & (px[:, 0] < image_width)
        & (px[:, 1] >= 0) & (px[:, 1] < image_height)
    )
    x = jnp.clip(px[:, 0], 0, image_width - 1)
    y = jnp.clip(px[:, 1], 0, image_height - 1)
    mask = jnp.zeros((image_height, image_width), img.dtype)
    mask = mask.at[y, x].set(jnp.where(valid, 1.0, 0.0))

    k = kernel_size
    kernel = jnp.ones((1, 1, k, k), img.dtype) / (k * k)

    def blur(ch):  # [H, W] -> [H, W]
        return jax.lax.conv_general_dilated(
            ch[None, None], kernel, (1, 1), "SAME",
            precision=jax.lax.Precision.HIGHEST,
        )[0, 0]

    mask_sum = blur(mask)
    dilated = (mask_sum > 0).astype(img.dtype)
    out = []
    for c in range(3):
        sm = blur(img[..., c])
        out.append(jnp.where(mask_sum > 0, sm / jnp.maximum(mask_sum, 1e-12),
                             sm))
    return jnp.stack(out, -1) * dilated[..., None]


def cluster_gaussians_by_surface(
    means3d: jnp.ndarray,  # [N, 3]
    normals: jnp.ndarray,  # [N, 3]
    cluster_threshold: float = 0.1,
) -> jnp.ndarray:
    """Group gaussians that plausibly lie on the same surface patch.

    The reference runs cuML DBSCAN on the concatenated [means, normals]
    features (utils.py:592-608) — data-dependent cluster count, GPU-only.
    The TPU-native replacement is a 6-D voxel hash at the same eps scale:
    quantize [means3d, normals] / threshold and give every occupied cell
    one label. Static shapes, jit-friendly, deterministic; patch granularity
    matches DBSCAN's eps neighborhoods (cells within one eps merge in the
    consistency loss through their shared mean direction). Returns int32
    labels [N] (no noise label — every gaussian belongs to its cell)."""
    feats = jnp.concatenate([means3d, normals], axis=-1) / cluster_threshold
    cells = jnp.floor(feats).astype(jnp.int32)
    # hash 6-D cell coords to a label via sort-unique
    key = cells.astype(jnp.int64)
    mix = jnp.zeros(means3d.shape[0], jnp.int64)
    for i in range(6):
        mix = mix * jnp.int64(1_000_003) + (key[:, i] + jnp.int64(1 << 20))
    _, labels = jnp.unique(mix, return_inverse=True,
                           size=means3d.shape[0], fill_value=-1)
    return labels.astype(jnp.int32)


def apply_surface_consistency_loss(
    gaussian_normals: jnp.ndarray,  # [N, 3]
    means3d: jnp.ndarray,  # [N, 3]
    weight: float = 0.5,
    cluster_threshold: float = 0.1,
) -> jnp.ndarray:
    """Pull each gaussian's normal toward its surface patch's mean
    direction: mean cosine distance to the per-cluster mean normal
    (reference utils.py:609-657, vectorized segment form)."""
    labels = cluster_gaussians_by_surface(
        means3d, gaussian_normals, cluster_threshold
    )
    n_seg = gaussian_normals.shape[0]
    sums = jax.ops.segment_sum(gaussian_normals, labels, num_segments=n_seg)
    mean_n = _safe_normalize(sums)[labels]  # [N, 3]
    cos = jnp.sum(
        _safe_normalize(gaussian_normals) * mean_n, axis=-1
    )
    return weight * jnp.mean(1.0 - cos)


def add_spatial_smoothness_loss(
    gaussian_normals: jnp.ndarray,  # [N, 3]
    means2d: jnp.ndarray,  # [N, 2]
    means3d: jnp.ndarray,  # [N, 3]
    k_neighbors: int = 8,
) -> jnp.ndarray:
    """Screen-space kNN normal smoothness, softmax-weighted by inverse 3D
    distance (reference utils.py:1462-1483). O(N^2) cdist like the
    reference — use on sampled subsets at scale."""
    d2 = jnp.sum(
        (means2d[:, None, :] - means2d[None, :, :]) ** 2, axis=-1
    )
    # k+1 smallest, drop self (distance 0)
    _, idx = jax.lax.top_k(-d2, k_neighbors + 1)
    idx = idx[:, 1:]
    d3 = jnp.linalg.norm(
        means3d[:, None, :] - means3d[idx], axis=-1
    )  # [N, k]
    w = jax.nn.softmax(1.0 / (d3 + 1e-6), axis=1)
    nn = _safe_normalize(gaussian_normals)
    cos = jnp.sum(nn[:, None, :] * nn[idx], axis=-1)
    return jnp.mean((1.0 - cos) * w)  # plain mean over [N, k], like the ref


def masked_progressive_normal_loss(
    gaussian_normals: jnp.ndarray,  # [N, 3]
    sampled_normals: jnp.ndarray,  # [N, 3]
    visible: jnp.ndarray,  # [N] bool
) -> jnp.ndarray:
    """The trainer's monocular-normal supervision term: the progressive
    (2x cosine) loss restricted to gaussians visible in the current view —
    the reference filters by in-viewport pixel coords before the loss
    (simple_trainer.py:792-805, :846-848); radii>0 is the same set here."""
    g = _safe_normalize(gaussian_normals)
    s = _safe_normalize(sampled_normals)
    err = 1.0 - jnp.sum(g * s, axis=-1)
    w = visible.astype(err.dtype)
    return 2.0 * jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)
