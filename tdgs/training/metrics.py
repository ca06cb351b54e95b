"""Perceptual metric: LPIPS deep feature distance (pure jnp).

The reference evaluates PSNR / SSIM / LPIPS (examples/simple_trainer.py
eval: LearnedPerceptualImagePatchSimilarity(net_type="alex"), vgg for the
compression benchmarks). Two backends:

1. **Real LPIPS** when pretrained weights are available locally: set
   ``TDGS_LPIPS_WEIGHTS=/path/to/lpips_<net>.npz`` or drop the file at
   ``~/.cache/tdgs/lpips_<net>.npz``. The npz holds the torchvision
   feature convs + the LPIPS 'lin' calibration heads; export once on any
   machine with network access:

       import lpips, numpy as np, torch
       m = lpips.LPIPS(net="alex")  # or "vgg"
       convs = [l for l in m.net.slice1 + m.net.slice2 + m.net.slice3
                + m.net.slice4 + m.net.slice5
                if isinstance(l, torch.nn.Conv2d)]
       out = {}
       for i, c in enumerate(convs):
           out[f"conv{i}_w"] = c.weight.detach().numpy()
           out[f"conv{i}_b"] = c.bias.detach().numpy()
       for i, l in enumerate(m.lins):
           out[f"lin{i}"] = l.model[-1].weight.detach().numpy().ravel()
       np.savez("lpips_alex.npz", **out)

   With real weights the eval stats key is ``lpips`` and values are
   comparable to the reference's CSV tables.

2. **Random-feature proxy** otherwise (no network egress here): the LPIPS
   *architecture* — strided conv pyramid, per-layer unit-normalized
   features, spatially-averaged squared differences — over a FIXED-SEED
   random filter bank. Random-feature perceptual distances are a known
   sound proxy (they correlate with learned LPIPS far better than pixel
   metrics; see 'The Unreasonable Effectiveness of Deep Features' §5
   ablations). Deterministic across runs; reported as ``lpips_proxy`` in
   eval stats (plus ``lpips_impl`` naming the backend) so reference CSV
   diffs can never be polluted by non-comparable absolute values.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

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


# ---------------------------------------------------------------------------
# Real LPIPS (learned weights, loaded from a local npz — module docstring)
# ---------------------------------------------------------------------------

# (taps after ReLU i, maxpool after tap?) per net. Convs are listed in
# torchvision order; each tuple is (stride, padding, pool_after_tap).
_ALEX = {
    "convs": [(4, 2), (1, 2), (1, 1), (1, 1), (1, 1)],
    "taps": [0, 1, 2, 3, 4],
    "pool_after": {0, 1},  # maxpool(3, 2) after relu1, relu2
}
_VGG = {
    "convs": [(1, 1)] * 13,
    "taps": [1, 3, 6, 9, 12],  # relu1_2, 2_2, 3_3, 4_3, 5_3
    "pool_after": {1, 3, 6, 9},  # maxpool(2, 2) between blocks
}
# LPIPS input scaling layer (applied to [-1, 1] images)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def _weights_path(net: str) -> Optional[str]:
    p = os.environ.get("TDGS_LPIPS_WEIGHTS")
    if p and os.path.isfile(p):
        return p
    p = os.path.expanduser(f"~/.cache/tdgs/lpips_{net}.npz")
    return p if os.path.isfile(p) else None


@functools.lru_cache(maxsize=2)
def _load_learned(net: str):
    """(convs [(w, b), ...], lins [w, ...]) or None if no local weights."""
    path = _weights_path(net)
    if path is None:
        return None
    import numpy as np

    z = np.load(path)
    arch = _ALEX if net == "alex" else _VGG
    n_convs = len(arch["convs"])
    convs = [
        (jnp.asarray(z[f"conv{i}_w"]), jnp.asarray(z[f"conv{i}_b"]))
        for i in range(n_convs)
    ]
    lins = [jnp.asarray(z[f"lin{i}"]) for i in range(len(arch["taps"]))]
    return convs, lins


def _learned_distance(img0, img1, net: str) -> jnp.ndarray:
    convs, lins = _load_learned(net)
    arch = _ALEX if net == "alex" else _VGG
    shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)

    def feats(x):
        h = (x * 2.0 - 1.0).transpose(0, 3, 1, 2)  # NCHW in [-1, 1]
        h = (h - shift) / scale
        out = []
        for i, ((w, b), (s, p)) in enumerate(zip(convs, arch["convs"])):
            h = jax.lax.conv_general_dilated(
                h, w, window_strides=(s, s), padding=[(p, p), (p, p)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=jax.lax.Precision.HIGHEST,
            ) + b.reshape(1, -1, 1, 1)
            h = jax.nn.relu(h)
            if i in arch["taps"]:
                out.append(h)
            if i in arch["pool_after"]:
                k = 3 if net == "alex" else 2
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, 2, 2),
                    "VALID",
                )
        return out

    total = 0.0
    for f0, f1, lin in zip(feats(img0), feats(img1), lins):
        n0 = f0 * jax.lax.rsqrt(jnp.sum(f0 * f0, 1, keepdims=True) + 1e-10)
        n1 = f1 * jax.lax.rsqrt(jnp.sum(f1 * f1, 1, keepdims=True) + 1e-10)
        d = (n0 - n1) ** 2
        total = total + jnp.mean(
            jnp.sum(d * lin.reshape(1, -1, 1, 1), axis=1), axis=(1, 2)
        )
    return total


def lpips_impl(net: str = "alex") -> str:
    """Which backend :func:`lpips` will use — 'learned-<net>' when local
    weights exist, else 'random-proxy'. Logged into eval stats."""
    return f"learned-{net}" if _load_learned(net) else "random-proxy"


def lpips(img0: jnp.ndarray, img1: jnp.ndarray,
          net: str = "alex") -> jnp.ndarray:
    """Perceptual distance between [B, H, W, 3] images in [0, 1].

    Real AlexNet/VGG LPIPS when local weights exist (module docstring),
    else the random-filter proxy: unit-normalize each layer's features
    along channels, mean squared difference over space, uniform layer
    weights (the 'lin' calibration needs learned weights)."""
    if _load_learned(net) is not None:
        return _learned_distance(img0, img1, net)
    total = 0.0
    for f0, f1 in zip(_features(img0), _features(img1)):
        n0 = f0 * jax.lax.rsqrt(jnp.sum(f0 * f0, 1, keepdims=True) + 1e-10)
        n1 = f1 * jax.lax.rsqrt(jnp.sum(f1 * f1, 1, keepdims=True) + 1e-10)
        total = total + jnp.mean((n0 - n1) ** 2, axis=(1, 2, 3))
    return total / len(_STAGES)
