"""PNG-based splat compression (parity with gsplat/compression/).

Reference scheme (png_compression.py:47-180): splats are sorted into a 2D
grid for spatial coherence (PLAS sort), then per-attribute codecs:
means → 16-bit PNG after log-transform, scales/quats/opacities/sh0 → 8-bit
min-max-quantized PNG, shN → K-means codebook, rest → npz. Requires a
square gaussian count (lowest-opacity splats cropped).

Deltas here: the PLAS sort is replaced by a Morton-order grid fill (no
external plas/torchpq deps; Morton order preserves most of the spatial
coherence PNG needs), 16-bit means are stored as two 8-bit PNGs
(high/low bytes), and the shN codebook K-means runs in jnp
(tdgs.segmentation.clustering.kmeans).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Dict

import numpy as np

from tdgs.utils.ply import morton_sort_centers


def _png_write(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    assert arr.dtype == np.uint8
    if arr.ndim == 2:
        Image.fromarray(arr, mode="L").save(path, optimize=True)
    elif arr.shape[-1] == 3:
        Image.fromarray(arr, mode="RGB").save(path, optimize=True)
    elif arr.shape[-1] == 4:
        Image.fromarray(arr, mode="RGBA").save(path, optimize=True)
    else:
        raise ValueError(arr.shape)


def _png_read(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im)


def _quantize(x: np.ndarray, bits: int = 8):
    mins = x.min(axis=0)
    maxs = x.max(axis=0)
    span = np.maximum(maxs - mins, 1e-12)
    q = np.round((x - mins) / span * (2**bits - 1)).astype(
        np.uint8 if bits == 8 else np.uint16
    )
    return q, mins, maxs


def _dequantize(q: np.ndarray, mins, maxs, bits: int = 8):
    span = np.asarray(maxs) - np.asarray(mins)
    return q.astype(np.float32) / (2**bits - 1) * span + np.asarray(mins)


def _log_transform(x):
    return np.sign(x) * np.log1p(np.abs(x))


def _inv_log_transform(y):
    return np.sign(y) * np.expm1(np.abs(y))


@dataclass
class PngCompression:
    """compress/decompress a splats dict to/from a directory of PNGs
    (reference PngCompression.compress:75 / decompress:113)."""

    n_clusters: int = 4096  # shN codebook size
    verbose: bool = False

    def compress(self, compress_dir: str, splats: Dict[str, np.ndarray]) -> None:
        os.makedirs(compress_dir, exist_ok=True)
        splats = {k: np.asarray(v) for k, v in splats.items()}
        n = splats["means"].shape[0]
        side = int(math.floor(math.sqrt(n)))
        n_crop = side * side
        if n_crop < n:
            # crop lowest-opacity splats (reference :135-140)
            keep = np.argsort(splats["opacities"].reshape(n))[n - n_crop :]
            splats = {k: v[keep] for k, v in splats.items()}
        order = morton_sort_centers(splats["means"])
        splats = {k: v[order] for k, v in splats.items()}

        meta: Dict = {"side": side, "attrs": {}}

        def grid(x):
            return x.reshape(side, side, *x.shape[1:])

        # means: log-transform → 16 bits → two 8-bit PNGs
        m = _log_transform(splats["means"])
        q, mins, maxs = _quantize(m, bits=16)
        _png_write(os.path.join(compress_dir, "means_u.png"),
                   grid((q >> 8).astype(np.uint8)))
        _png_write(os.path.join(compress_dir, "means_l.png"),
                   grid((q & 0xFF).astype(np.uint8)))
        meta["attrs"]["means"] = {
            "mins": mins.tolist(), "maxs": maxs.tolist(), "log": True
        }

        for name, arr, mode in (
            ("scales", splats["scales"], "rgb"),
            ("quats", splats["quats"], "rgba"),
            ("opacities", splats["opacities"].reshape(-1, 1), "l"),
            ("sh0", splats["sh0"].reshape(-1, 3), "rgb"),
        ):
            q, mins, maxs = _quantize(arr, bits=8)
            img = grid(q if mode != "l" else q[:, 0])
            _png_write(os.path.join(compress_dir, f"{name}.png"), img)
            meta["attrs"][name] = {
                "mins": np.atleast_1d(mins).tolist(),
                "maxs": np.atleast_1d(maxs).tolist(),
            }

        # shN: K-means codebook (reference uses torchpq kmeans)
        shN = splats["shN"].reshape(n_crop, -1)
        if shN.shape[1] > 0:
            import jax.numpy as jnp

            from tdgs.segmentation.clustering import kmeans

            k = min(self.n_clusters, n_crop)
            rs = np.random.default_rng(0)
            init = shN[rs.choice(n_crop, k, replace=False)]
            labels, cents = kmeans(jnp.asarray(shN), jnp.asarray(init), iters=10)
            np.savez_compressed(
                os.path.join(compress_dir, "shN.npz"),
                labels=np.asarray(labels).astype(np.uint16),
                centroids=np.asarray(cents).astype(np.float16),
                shape=np.array(splats["shN"].shape),
            )

        extras = {
            k: v
            for k, v in splats.items()
            if k not in ("means", "scales", "quats", "opacities", "sh0", "shN")
        }
        if extras:
            np.savez_compressed(os.path.join(compress_dir, "extras.npz"), **extras)

        with open(os.path.join(compress_dir, "meta.json"), "w") as f:
            json.dump(meta, f)

    def decompress(self, compress_dir: str) -> Dict[str, np.ndarray]:
        with open(os.path.join(compress_dir, "meta.json")) as f:
            meta = json.load(f)
        side = meta["side"]
        n = side * side

        hi = _png_read(os.path.join(compress_dir, "means_u.png")).reshape(n, 3)
        lo = _png_read(os.path.join(compress_dir, "means_l.png")).reshape(n, 3)
        q16 = (hi.astype(np.uint16) << 8) | lo.astype(np.uint16)
        a = meta["attrs"]["means"]
        means = _inv_log_transform(_dequantize(q16, a["mins"], a["maxs"], bits=16))

        out = {"means": means.astype(np.float32)}
        for name, ch in (("scales", 3), ("quats", 4), ("opacities", 1), ("sh0", 3)):
            img = _png_read(os.path.join(compress_dir, f"{name}.png"))
            q = img.reshape(n, ch)
            a = meta["attrs"][name]
            x = _dequantize(q, a["mins"], a["maxs"], bits=8).astype(np.float32)
            if name == "opacities":
                x = x[:, 0]
            if name == "sh0":
                x = x.reshape(n, 1, 3)
            out[name] = x

        shn_path = os.path.join(compress_dir, "shN.npz")
        if os.path.exists(shn_path):
            with np.load(shn_path) as z:
                cents = z["centroids"].astype(np.float32)
                labels = z["labels"].astype(np.int64)
                shape = z["shape"]
            out["shN"] = cents[labels].reshape(tuple(shape))
        else:
            out["shN"] = np.zeros((n, 0, 3), np.float32)

        extras_path = os.path.join(compress_dir, "extras.npz")
        if os.path.exists(extras_path):
            with np.load(extras_path) as z:
                for k in z.files:
                    out[k] = z[k]
        return out
