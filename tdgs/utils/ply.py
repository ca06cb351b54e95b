"""Gaussian-splat file IO: PLY and .splat formats (pure numpy).

Capability parity with the reference's gsplat/exporter.py (export_splats:475
→ ply/splat writers) and gsplat/utils.py (save_ply:12, load_ply:259 — the
fork-added binary PLY reader used by main.py's GaussianModel). The binary
PLY property layout is the standard Inria 3DGS convention:
x y z nx ny nz f_dc_0..2 f_rest_* opacity scale_0..2 rot_0..3.
"""

from __future__ import annotations

import io
import struct
from typing import Dict, Optional, Tuple

import numpy as np


def morton_sort_centers(means: np.ndarray) -> np.ndarray:
    """Order gaussians along a Morton (Z-order) curve for cache-friendly
    files (reference exporter.py:sort_centers:56). Returns indices."""
    lo = means.min(axis=0)
    hi = means.max(axis=0)
    q = ((means - lo) / np.maximum(hi - lo, 1e-12) * 1023).astype(np.uint32)

    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )
    return np.argsort(code)


def save_ply(
    path: str,
    means: np.ndarray,  # [N, 3]
    scales: np.ndarray,  # [N, 3] log-scales
    quats: np.ndarray,  # [N, 4] wxyz
    opacities: np.ndarray,  # [N] logits
    sh0: np.ndarray,  # [N, 1, 3]
    shN: np.ndarray,  # [N, K-1, 3]
    extra: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """Write the standard 3DGS binary PLY (raw/pre-activation values)."""
    n = means.shape[0]
    km1 = shN.shape[1]
    fields = ["x", "y", "z", "nx", "ny", "nz"]
    fields += [f"f_dc_{i}" for i in range(3)]
    fields += [f"f_rest_{i}" for i in range(km1 * 3)]
    fields += ["opacity"]
    fields += [f"scale_{i}" for i in range(3)]
    fields += [f"rot_{i}" for i in range(4)]
    extra = extra or {}
    extra_cols = []
    for name, arr in extra.items():
        arr = arr.reshape(n, -1)
        for i in range(arr.shape[1]):
            fields.append(f"{name}_{i}")
        extra_cols.append(arr.astype(np.float32))

    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {f}\n" for f in fields)
        + "end_header\n"
    )
    # f_rest layout: channel-major (all R coeffs, all G, all B) — the Inria
    # convention (reference exporter.py splat2ply_bytes).
    sh_rest = shN.transpose(0, 2, 1).reshape(n, -1)  # [N, 3*(K-1)]
    cols = [
        means.astype(np.float32),
        np.zeros((n, 3), np.float32),
        sh0.reshape(n, 3).astype(np.float32),
        sh_rest.astype(np.float32),
        opacities.reshape(n, 1).astype(np.float32),
        scales.astype(np.float32),
        quats.astype(np.float32),
    ] + extra_cols
    data = np.concatenate(cols, axis=1)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.astype("<f4").tobytes())


def load_ply(path: str) -> Dict[str, np.ndarray]:
    """Read a 3DGS binary PLY into a raw-parameter dict
    (reference gsplat/utils.py:load_ply:259). Returns means, scales (log),
    quats (wxyz), opacities (logit), sh0 [N,1,3], shN [N,K-1,3], plus any
    extra float properties grouped by prefix."""
    with open(path, "rb") as f:
        blob = f.read()
    header_end = blob.index(b"end_header\n") + len(b"end_header\n")
    header = blob[:header_end].decode("ascii")
    lines = [l.strip() for l in header.splitlines()]
    n = 0
    props = []
    fmt_binary = True
    for l in lines:
        if l.startswith("format"):
            fmt_binary = "binary_little_endian" in l
        elif l.startswith("element vertex"):
            n = int(l.split()[-1])
        elif l.startswith("property float"):
            props.append(l.split()[-1])
        elif l.startswith("property") and "float" not in l:
            raise ValueError(f"unsupported property type: {l}")
    if not fmt_binary:
        raise ValueError("only binary_little_endian PLY supported")
    data = np.frombuffer(
        blob, dtype="<f4", count=n * len(props), offset=header_end
    ).reshape(n, len(props)).copy()
    col = {name: data[:, i] for i, name in enumerate(props)}

    means = np.stack([col["x"], col["y"], col["z"]], -1)
    scales = np.stack([col[f"scale_{i}"] for i in range(3)], -1)
    quats = np.stack([col[f"rot_{i}"] for i in range(4)], -1)
    opacities = col["opacity"]
    sh0 = np.stack([col[f"f_dc_{i}"] for i in range(3)], -1)[:, None, :]
    n_rest = len([p for p in props if p.startswith("f_rest_")])
    km1 = n_rest // 3
    if n_rest:
        rest = np.stack([col[f"f_rest_{i}"] for i in range(n_rest)], -1)
        shN = rest.reshape(n, 3, km1).transpose(0, 2, 1)
    else:
        shN = np.zeros((n, 0, 3), np.float32)

    out = {
        "means": means,
        "scales": scales,
        "quats": quats,
        "opacities": opacities,
        "sh0": sh0,
        "shN": shN,
    }
    # extra property groups (e.g. identity_encodings_0..15)
    known = {p for p in props if p in ("x", "y", "z", "nx", "ny", "nz", "opacity")
             or p.startswith(("f_dc_", "f_rest_", "scale_", "rot_"))}
    extra_names = sorted({p.rsplit("_", 1)[0] for p in props if p not in known})
    for name in extra_names:
        idxs = sorted(
            (int(p.rsplit("_", 1)[1]), p)
            for p in props
            if p.startswith(name + "_") and p.rsplit("_", 1)[0] == name
        )
        out[name] = np.stack([col[p] for _, p in idxs], -1)
    return out


def save_splat(
    path: str,
    means: np.ndarray,
    scales: np.ndarray,  # log
    quats: np.ndarray,  # wxyz
    opacities: np.ndarray,  # logits
    sh0: np.ndarray,  # [N, 1, 3]
) -> None:
    """antimatter15 .splat format: 32 bytes per splat — position f32x3,
    scale f32x3, rgba u8x4, quat u8x4 (reference exporter.py:420)."""
    idx = morton_sort_centers(means)
    means = means[idx]
    scales = np.exp(scales[idx])
    quats = quats[idx]
    quats = quats / np.linalg.norm(quats, axis=-1, keepdims=True)
    op = 1.0 / (1.0 + np.exp(-opacities[idx]))
    rgb = np.clip(sh0[idx, 0] * 0.2820947917738781 + 0.5, 0, 1)

    with open(path, "wb") as f:
        for i in range(means.shape[0]):
            f.write(struct.pack("<3f", *means[i]))
            f.write(struct.pack("<3f", *scales[i]))
            rgba = (*(rgb[i] * 255).astype(np.uint8), int(op[i] * 255))
            f.write(struct.pack("<4B", *rgba))
            q = ((quats[i] * 128) + 128).clip(0, 255).astype(np.uint8)
            f.write(struct.pack("<4B", *q))


def export_splats(
    means: np.ndarray,
    scales: np.ndarray,
    quats: np.ndarray,
    opacities: np.ndarray,
    sh0: np.ndarray,
    shN: np.ndarray,
    format: str = "ply",
    save_to: str = "splats.ply",
    extra: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """Export splats (reference gsplat/exporter.py:export_splats:475).
    Formats: "ply" (standard 3DGS), "splat" (antimatter15)."""
    means = np.asarray(means)
    scales = np.asarray(scales)
    quats = np.asarray(quats)
    opacities = np.asarray(opacities)
    sh0 = np.asarray(sh0)
    shN = np.asarray(shN)
    if format == "ply":
        save_ply(save_to, means, scales, quats, opacities, sh0, shN, extra)
    elif format == "splat":
        save_splat(save_to, means, scales, quats, opacities, sh0)
    else:
        raise ValueError(f"unsupported format {format!r}")
