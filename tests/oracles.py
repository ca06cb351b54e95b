"""Independent numpy oracles for kernel unit tests.

These re-derive the reference semantics (gsplat/cuda/_torch_impl.py and the
CUDA kernels' documented behavior) in plain numpy with naive loops and
np.linalg calls — deliberately a *different* code path from the jnp/Pallas
implementations under test.
"""

from __future__ import annotations

import numpy as np

ALPHA_THRESHOLD = 1.0 / 255.0


def quat_to_rotmat_np(q):
    """wxyz quaternion -> rotation matrix, via the outer-product identity
    R = (w^2 - u.u) I + 2 u u^T + 2 w [u]_x  (different derivation path)."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w = q[..., 0]
    u = q[..., 1:]
    eye = np.eye(3)
    uu = u[..., :, None] * u[..., None, :]
    ux = np.zeros(q.shape[:-1] + (3, 3))
    ux[..., 0, 1] = -u[..., 2]
    ux[..., 0, 2] = u[..., 1]
    ux[..., 1, 0] = u[..., 2]
    ux[..., 1, 2] = -u[..., 0]
    ux[..., 2, 0] = -u[..., 1]
    ux[..., 2, 1] = u[..., 0]
    dot = (u * u).sum(-1)
    return (
        (w**2 - dot)[..., None, None] * eye
        + 2.0 * uu
        + 2.0 * w[..., None, None] * ux
    )


def covar_np(quats, scales):
    R = quat_to_rotmat_np(quats)
    S = np.zeros(R.shape)
    S[..., 0, 0] = scales[..., 0]
    S[..., 1, 1] = scales[..., 1]
    S[..., 2, 2] = scales[..., 2]
    M = R @ S
    return M @ np.swapaxes(M, -1, -2)


def project_gaussians_np(
    means,  # [N, 3]
    covars,  # [N, 3, 3]
    viewmat,  # [4, 4]
    K,  # [3, 3]
    width,
    height,
    eps2d=0.3,
    near_plane=0.01,
    far_plane=1e10,
    radius_clip=0.0,
    opacities=None,
    calc_compensations=False,
    camera_model="pinhole",
):
    """Naive per-gaussian loop implementing the fused-projection spec."""
    N = means.shape[0]
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    radii = np.zeros((N, 2), dtype=np.int32)
    means2d = np.zeros((N, 2))
    depths = np.zeros((N,))
    conics = np.zeros((N, 3))
    comps = np.zeros((N,))

    for i in range(N):
        p = R @ means[i] + t
        S = R @ covars[i] @ R.T
        depths[i] = p[2]
        tz = p[2]
        if camera_model == "pinhole":
            tan_fovx = 0.5 * width / fx
            tan_fovy = 0.5 * height / fy
            lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
            lim_x_neg = cx / fx + 0.3 * tan_fovx
            lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
            lim_y_neg = cy / fy + 0.3 * tan_fovy
            tzz = tz if tz != 0 else 1e-8
            txc = tzz * np.clip(p[0] / tzz, -lim_x_neg, lim_x_pos)
            tyc = tzz * np.clip(p[1] / tzz, -lim_y_neg, lim_y_pos)
            J = np.array(
                [
                    [fx / tzz, 0.0, -fx * txc / tzz**2],
                    [0.0, fy / tzz, -fy * tyc / tzz**2],
                ]
            )
            mean2d = np.array([fx * p[0] / tzz + cx, fy * p[1] / tzz + cy])
        elif camera_model == "ortho":
            J = np.array([[fx, 0.0, 0.0], [0.0, fy, 0.0]])
            mean2d = np.array([p[0] * fx + cx, p[1] * fy + cy])
        elif camera_model == "fisheye":
            eps = 1e-7
            x, y, z = p
            xy_len = np.sqrt(x * x + y * y) + eps
            theta = np.arctan2(xy_len, z + eps)
            mean2d = np.array(
                [x * fx * theta / xy_len + cx, y * fy * theta / xy_len + cy]
            )
            x2 = x * x + eps
            y2 = y * y
            xy = x * y
            x2y2 = x2 + y2
            x2y2z2_inv = 1.0 / (x2y2 + z * z)
            b = np.arctan2(xy_len, z) / xy_len / x2y2
            a = z * x2y2z2_inv / x2y2
            J = np.array(
                [
                    [fx * (x2 * a + y2 * b), fx * xy * (a - b), -fx * x * x2y2z2_inv],
                    [fy * xy * (a - b), fy * (y2 * a + x2 * b), -fy * y * x2y2z2_inv],
                ]
            )
        else:
            raise ValueError(camera_model)

        cov2d = J @ S @ J.T
        det_orig = np.linalg.det(cov2d)
        cov2d_blur = cov2d + eps2d * np.eye(2)
        det = np.linalg.det(cov2d_blur)
        comp = np.sqrt(max(det_orig / max(det, 1e-10), 0.0))
        comps[i] = comp

        means2d[i] = mean2d
        inv = np.linalg.inv(cov2d_blur) if det > 0 else np.zeros((2, 2))
        conics[i] = [inv[0, 0], inv[0, 1], inv[1, 1]]

        if det <= 0 or not (near_plane < p[2] < far_plane):
            continue
        extend = 3.33
        if opacities is not None:
            op = opacities[i] * (comp if calc_compensations else 1.0)
            if op < ALPHA_THRESHOLD:
                continue
            extend = min(extend, np.sqrt(2.0 * np.log(op / ALPHA_THRESHOLD)))
        rx = np.ceil(extend * np.sqrt(max(cov2d_blur[0, 0], 0.0)))
        ry = np.ceil(extend * np.sqrt(max(cov2d_blur[1, 1], 0.0)))
        if rx <= radius_clip and ry <= radius_clip:
            continue
        if (
            mean2d[0] + rx <= 0
            or mean2d[0] - rx >= width
            or mean2d[1] + ry <= 0
            or mean2d[1] - ry >= height
        ):
            continue
        radii[i] = [int(rx), int(ry)]

    if not calc_compensations:
        comps = None
    return radii, means2d, depths, conics, comps


def isect_tiles_np(means2d, radii, depths, tile_size, tile_width, tile_height):
    """Brute-force intersection enumeration; returns sorted
    (key, depth, flatten_id) triples. means2d/radii/depths are [I, N, ...]."""
    I, N = means2d.shape[:2]
    entries = []
    for i in range(I):
        for g in range(N):
            rx, ry = radii[i, g]
            if rx <= 0 or ry <= 0:
                continue
            x, y = means2d[i, g]
            tmin_x = int(np.clip(np.floor((x - rx) / tile_size), 0, tile_width))
            tmin_y = int(np.clip(np.floor((y - ry) / tile_size), 0, tile_height))
            tmax_x = int(np.clip(np.ceil((x + rx) / tile_size), 0, tile_width))
            tmax_y = int(np.clip(np.ceil((y + ry) / tile_size), 0, tile_height))
            for ty in range(tmin_y, tmax_y):
                for tx in range(tmin_x, tmax_x):
                    key = i * tile_width * tile_height + ty * tile_width + tx
                    entries.append((key, float(depths[i, g]), i * N + g))
    entries.sort(key=lambda e: (e[0], e[1]))
    return entries


def rasterize_np(
    means2d,  # [I, N, 2]
    conics,  # [I, N, 3]
    colors,  # [I, N, D]
    opacities,  # [I, N]
    width,
    height,
    tile_size,
    entries,  # sorted (key, depth, flatten_id) from isect_tiles_np
    tile_width,
    tile_height,
    backgrounds=None,
):
    """Sequential per-pixel front-to-back compositing — the exact CUDA
    semantics (RasterizeToPixels3DGSFwd.cu) with early exit."""
    I, N, D = colors.shape
    out = np.zeros((I, height, width, D))
    alphas = np.zeros((I, height, width))
    means2d_f = means2d.reshape(I * N, 2)
    conics_f = conics.reshape(I * N, 3)
    colors_f = colors.reshape(I * N, D)
    opac_f = opacities.reshape(I * N)

    # group entries per tile key
    from collections import defaultdict

    per_tile = defaultdict(list)
    for key, depth, fid in entries:
        per_tile[key].append(fid)

    for i in range(I):
        for py in range(height):
            for px in range(width):
                tx, ty = px // tile_size, py // tile_size
                key = i * tile_width * tile_height + ty * tile_width + tx
                T = 1.0
                acc = np.zeros(D)
                for fid in per_tile.get(key, []):
                    a, b, c = conics_f[fid]
                    dx = means2d_f[fid, 0] - (px + 0.5)
                    dy = means2d_f[fid, 1] - (py + 0.5)
                    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
                    alpha = min(0.999, opac_f[fid] * np.exp(-sigma))
                    if sigma < 0 or alpha < ALPHA_THRESHOLD:
                        continue
                    next_T = T * (1.0 - alpha)
                    if next_T <= 1e-4:
                        break
                    acc += colors_f[fid] * alpha * T
                    T = next_T
                alphas[i, py, px] = 1.0 - T
                if backgrounds is not None:
                    acc = acc + T * backgrounds[i]
                out[i, py, px] = acc
    return out, alphas
