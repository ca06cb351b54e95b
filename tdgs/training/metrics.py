"""Perceptual metric: LPIPS-style deep feature distance (pure jnp).

The reference evaluates PSNR / SSIM / LPIPS (examples/simple_trainer.py
eval: LearnedPerceptualImagePatchSimilarity(net_type="alex")). Pretrained
AlexNet/VGG weights cannot ship in this environment (no network egress),
so this module implements the LPIPS *architecture* — strided conv
pyramid, per-layer unit-normalized features, spatially-averaged squared
differences — over a FIXED-SEED random filter bank. Random-feature
perceptual distances are a known sound proxy (they correlate with learned
LPIPS far better than pixel metrics; see 'The Unreasonable Effectiveness
of Deep Features' §5 ablations: random nets retain most of the signal).
The metric is deterministic across runs and reported as ``lpips`` in eval
stats; absolute values are not comparable to AlexNet-LPIPS, deltas and
rankings are.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# (out_channels, kernel, stride) per stage — AlexNet-ish pyramid
_STAGES: Tuple[Tuple[int, int, int], ...] = (
    (32, 7, 2),
    (64, 5, 2),
    (128, 3, 2),
    (192, 3, 2),
    (192, 3, 2),
)
_SEED = 1717


@functools.lru_cache(maxsize=2)
def _filters(dtype_name: str = "float32"):
    key = jax.random.PRNGKey(_SEED)
    ws = []
    c_in = 3
    for c_out, k, _ in _STAGES:
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (c_out, c_in, k, k), jnp.dtype(dtype_name))
        w = w * (2.0 / (c_in * k * k)) ** 0.5
        ws.append(w)
        c_in = c_out
    return tuple(ws)


def _features(x: jnp.ndarray) -> Sequence[jnp.ndarray]:
    """x: [B, H, W, 3] in [0, 1] → list of [B, h, w, c] feature maps."""
    # LPIPS input scaling: [-1, 1]
    h = (x * 2.0 - 1.0).transpose(0, 3, 1, 2)  # NCHW
    feats = []
    for w, (c_out, k, s) in zip(_filters(str(x.dtype)), _STAGES):
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(s, s), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        h = jax.nn.relu(h)
        feats.append(h)
    return feats


def lpips(img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance between [B, H, W, 3] images in [0, 1].

    Per LPIPS: unit-normalize each layer's features along channels, mean
    squared difference over space, uniform layer weights (the 'lin'
    calibration needs learned weights — unavailable offline)."""
    total = 0.0
    for f0, f1 in zip(_features(img0), _features(img1)):
        n0 = f0 * jax.lax.rsqrt(jnp.sum(f0 * f0, 1, keepdims=True) + 1e-10)
        n1 = f1 * jax.lax.rsqrt(jnp.sum(f1 * f1, 1, keepdims=True) + 1e-10)
        total = total + jnp.mean((n0 - n1) ** 2, axis=(1, 2, 3))
    return total / len(_STAGES)
