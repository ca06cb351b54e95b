"""Training losses and image metrics (pure jnp).

Replaces the reference's torchmetrics/fused-ssim usage
(examples/simple_trainer.py:840-844: loss = (1-λ)·L1 + λ·(1-SSIM)) with jnp
implementations that fuse into the training step under jit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return ((pred - target) ** 2).mean()


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = ((pred - target) ** 2).mean()
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


@functools.partial(jax.jit, static_argnames=("window_size",))
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(window_size, dtype=jnp.float32) - (window_size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _filter2d_separable(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable 2D filter. img: [B, H, W, C] → valid conv.

    precision=HIGHEST is load-bearing: TPU convs default to bf16 MXU
    passes, whose ~2^-8 relative error on E[x²] makes the SSIM variance
    E[x²]−E[x]² come out as low as −5e-3 on flat image regions — below
    −c2, so the SSIM denominator crosses zero and the loss emits ±inf
    (observed as rgbloss=-inf → corrupted params in MCMC training runs).
    """
    B, H, W, C = img.shape
    k = window.shape[0]
    x = img.transpose(0, 3, 1, 2).reshape(B * C, 1, H, W)
    kern_h = window.reshape(1, 1, k, 1)
    kern_w = window.reshape(1, 1, 1, k)
    x = jax.lax.conv_general_dilated(
        x, kern_h, (1, 1), "VALID", precision=jax.lax.Precision.HIGHEST
    )
    x = jax.lax.conv_general_dilated(
        x, kern_w, (1, 1), "VALID", precision=jax.lax.Precision.HIGHEST
    )
    Ho, Wo = x.shape[-2:]
    return x.reshape(B, C, Ho, Wo).transpose(0, 2, 3, 1)


def ssim(
    pred: jnp.ndarray,  # [..., H, W, C] in [0, 1]
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    max_val: float = 1.0,
) -> jnp.ndarray:
    """Standard single-scale SSIM with an 11×11 gaussian window (the
    convention of the reference's fused_ssim / torchmetrics SSIM)."""
    lead = pred.shape[:-3]
    H, W, C = pred.shape[-3:]
    p = pred.reshape((-1, H, W, C)).astype(jnp.float32)
    t = target.reshape((-1, H, W, C)).astype(jnp.float32)

    win = _gaussian_window(window_size, sigma)
    mu_p = _filter2d_separable(p, win)
    mu_t = _filter2d_separable(t, win)
    mu_pp = _filter2d_separable(p * p, win)
    mu_tt = _filter2d_separable(t * t, win)
    mu_pt = _filter2d_separable(p * t, win)

    # clamp: true variance is ≥ 0; f32 cancellation on flat regions can
    # leave a small negative residue that would destabilize the ratio
    var_p = jnp.maximum(mu_pp - mu_p**2, 0.0)
    var_t = jnp.maximum(mu_tt - mu_t**2, 0.0)
    cov = mu_pt - mu_p * mu_t

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    return (num / den).mean()


def d_ssim_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    ssim_lambda: float = 0.2,
) -> jnp.ndarray:
    """(1−λ)·L1 + λ·(1−SSIM): the reference's main photometric loss
    (simple_trainer.py:840-844)."""
    return (1.0 - ssim_lambda) * l1_loss(pred, target) + ssim_lambda * (
        1.0 - ssim(pred, target)
    )


def depth_loss_sparse(
    render_depth: jnp.ndarray,  # [..., H, W, 1]
    points_px: jnp.ndarray,  # [..., M, 2] pixel coords of sparse points
    point_depths: jnp.ndarray,  # [..., M]
    valid: Optional[jnp.ndarray] = None,  # [..., M]
) -> jnp.ndarray:
    """Sparse COLMAP-point depth supervision: L1 between rendered depth
    sampled at projected SfM points and their depths in disparity space
    (reference: simple_trainer.py:850-902)."""
    H, W = render_depth.shape[-3:-1]
    x = jnp.clip(points_px[..., 0].astype(jnp.int32), 0, W - 1)
    y = jnp.clip(points_px[..., 1].astype(jnp.int32), 0, H - 1)
    sampled = jnp.take_along_axis(
        render_depth[..., 0].reshape(render_depth.shape[:-3] + (H * W,)),
        (y * W + x).reshape(points_px.shape[:-1]),
        axis=-1,
    )
    disp = 1.0 / jnp.maximum(sampled, 1e-6)
    disp_gt = 1.0 / jnp.maximum(point_depths, 1e-6)
    err = jnp.abs(disp - disp_gt)
    if valid is not None:
        return jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return err.mean()


def depth_loss_dense(
    render_depth: jnp.ndarray,  # [..., H, W, 1]
    depth_map: jnp.ndarray,  # [..., H, W] ground-truth (0 = invalid)
    scene_scale: float = 1.0,
) -> jnp.ndarray:
    """Dense precomputed-depth supervision: masked L1 in disparity space
    against a refined depth map, scaled by the scene scale (reference
    simple_trainer.py:851-869, the PriorDepthAnything branch)."""
    rd = render_depth[..., 0]
    valid = (depth_map > 0.0) & (rd > 0.0)
    disp_r = jnp.where(valid, 1.0 / jnp.maximum(rd, 1e-8), 0.0)
    disp_g = jnp.where(valid, 1.0 / jnp.maximum(depth_map, 1e-8), 0.0)
    n = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(jnp.abs(disp_r - disp_g)) / n * scene_scale
