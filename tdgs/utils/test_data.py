"""Synthetic test-scene helper (parity with gsplat/_helper.py:load_test_data).

The reference loads a bundled garden-scene npz (absent in the fork) with a
``scene_grid`` replication knob to fake large scenes. Here the scene is
generated procedurally (no binary assets in the repo): a colorful blob
cloud plus a ground plane, with the same grid-replication trick.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# flat backdrop the domino GT images are composited onto. Training against
# this dataset MUST composite onto the same constant
# (Config.background_color) — otherwise the model fabricates giant gray
# splats to explain the backdrop and the scene degenerates.
DOMINO_BACKGROUND = 0.78


def load_test_data(
    device=None,
    scene_grid: int = 1,
    n: int = 1000,
    seed: int = 42,
) -> Tuple:
    """Returns (means, quats, scales, opacities, colors, viewmats, Ks,
    width, height) as numpy arrays — one camera per grid cell."""
    rng = np.random.default_rng(seed)
    base_means = rng.normal(size=(n, 3)).astype(np.float32) * [1.2, 1.2, 0.4]
    base_means[:, 2] += 0.5
    colors = rng.uniform(0.1, 1.0, size=(n, 3)).astype(np.float32)

    means_list, colors_list = [], []
    viewmats, Ks = [], []
    width, height = 640, 480
    f = 500.0
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32)
    g = scene_grid
    for gy in range(g):
        for gx in range(g):
            offset = np.array([4.0 * gx, 4.0 * gy, 0.0], np.float32)
            means_list.append(base_means + offset)
            colors_list.append(colors)
            vm = np.eye(4, dtype=np.float32)
            vm[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
            cam = offset + np.array([0.0, -6.0, 1.5], np.float32)
            vm[:3, 3] = -(vm[:3, :3] @ cam)
            viewmats.append(vm)
            Ks.append(K)

    means = np.concatenate(means_list)
    colors_all = np.concatenate(colors_list)
    m = means.shape[0]
    quats = rng.normal(size=(m, 4)).astype(np.float32)
    scales = rng.uniform(0.02, 0.12, size=(m, 3)).astype(np.float32)
    opacities = rng.uniform(0.4, 1.0, size=(m,)).astype(np.float32)
    return (
        means, quats, scales, opacities, colors_all,
        np.stack(viewmats), np.stack(Ks), width, height,
    )


def _rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix → COLMAP wxyz quaternion (Shepperd's method)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
        q = np.empty(4)
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
    return (q / np.linalg.norm(q)).astype(np.float64)


def _look_at_viewmat(eye: np.ndarray, target: np.ndarray) -> np.ndarray:
    """World-to-camera [4,4] for an OpenCV camera at eye looking at target
    (z-up world; camera +z forward, +y down)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right) + 1e-12
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd]).astype(np.float32)
    vm = np.eye(4, dtype=np.float32)
    vm[:3, :3] = R
    vm[:3, 3] = -R @ eye
    return vm


def _sample_box_surface(rng, n, half_extents):
    """Uniform sample n points on the surface of an axis-aligned box."""
    hx, hy, hz = half_extents
    areas = np.array([hy * hz, hy * hz, hx * hz, hx * hz, hx * hy, hx * hy])
    face = rng.choice(6, size=n, p=areas / areas.sum())
    u = rng.uniform(-1, 1, size=(n, 2))
    pts = np.empty((n, 3), np.float32)
    for f in range(6):
        m = face == f
        axis = f // 2
        sign = 1.0 if f % 2 == 0 else -1.0
        he = [hx, hy, hz]
        p = np.zeros((m.sum(), 3), np.float32)
        p[:, axis] = sign * he[axis]
        others = [a for a in range(3) if a != axis]
        p[:, others[0]] = u[m, 0] * he[others[0]]
        p[:, others[1]] = u[m, 1] * he[others[1]]
        pts[m] = p
    return pts


def _write_colmap_sparse(sparse, width, height, f, viewmats, image_names,
                         pts, cols):
    """Write minimal cameras.bin / images.bin / points3D.bin (one PINHOLE
    camera shared by all images; real orbit rotations as qvecs)."""
    import os
    import struct

    os.makedirs(sparse, exist_ok=True)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", 1))
        fd.write(struct.pack("<iiQQ", 1, 1, width, height))
        fd.write(struct.pack("<4d", f, f, width / 2, height / 2))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", len(pts)))
        for i in range(len(pts)):
            fd.write(struct.pack("<q", i + 1))
            fd.write(struct.pack("<3d", *pts[i]))
            fd.write(struct.pack("<3B", *(np.clip(cols[i], 0, 1) * 255).astype(np.uint8)))
            fd.write(struct.pack("<d", 0.5))
            fd.write(struct.pack("<Q", 0))
    with open(os.path.join(sparse, "images.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", len(viewmats)))
        for i, vm in enumerate(viewmats):
            fd.write(struct.pack("<i", i + 1))
            fd.write(struct.pack("<4d", *_rotmat_to_qvec(vm[:3, :3])))
            fd.write(struct.pack("<3d", *vm[:3, 3]))
            fd.write(struct.pack("<i", 1))
            fd.write(image_names[i].encode() + b"\x00")
            fd.write(struct.pack("<Q", 0))


def make_domino_scene(
    root,
    n_dominoes: int = 6,
    n_images: int = 32,
    width: int = 480,
    height: int = 360,
    gauss_per_domino: int = 700,
    ground_gauss: int = 2500,
    seed: int = 3,
    domino_half_extents=(0.05, 0.2, 0.4),
    spacing: float = 0.55,
    sfm_points: int = 4000,
):
    """Write a procedural multi-view COLMAP **domino** dataset — the in-repo
    stand-in for the reference README's captured domino scene (README.md:11-45):
    GT gaussians form a row of colored dominoes standing on a ground plane
    (z-up, ground z=0 — the physics engine's frame), rendered from an orbit
    of cameras, with per-view instance-id masks under
    masks/instance_ids_npy/{stem}_instance_id.npy (ids 1..n_dominoes, 0 =
    background — the convention of examples/datasets/colmap.py:498-512).

    Returns a dict with the GT arrays (means/quats/scales/opacities/colors/
    labels/viewmats/Ks) for tests and golden comparisons.
    """
    import os

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tdgs.rendering import rasterization

    rng = np.random.default_rng(seed)
    hx, hy, hz = domino_half_extents

    means_list, cols_list, labels_list = [], [], []
    # ground plane: thin disks on z≈0, subdued checker tint
    span = spacing * n_dominoes * 0.75 + 1.0
    gxy = rng.uniform(-span, span, size=(ground_gauss, 2)).astype(np.float32)
    gxy[:, 0] += spacing * (n_dominoes - 1) / 2  # center under the row
    gz = np.zeros((ground_gauss, 1), np.float32)
    checker = ((np.floor(gxy[:, 0] * 2) + np.floor(gxy[:, 1] * 2)) % 2)
    gcol = np.stack([0.35 + 0.15 * checker] * 3, axis=-1).astype(np.float32)
    gcol += rng.uniform(-0.03, 0.03, size=gcol.shape).astype(np.float32)
    means_list.append(np.concatenate([gxy, gz], axis=1))
    cols_list.append(gcol)
    labels_list.append(np.zeros(ground_gauss, np.int32))

    # dominoes: a row along +x, thin along x so they topple forward
    hues = np.linspace(0.0, 1.0, n_dominoes, endpoint=False)
    for d in range(n_dominoes):
        pts = _sample_box_surface(rng, gauss_per_domino, (hx, hy, hz))
        pts[:, 0] += spacing * d
        pts[:, 2] += hz  # stand on the ground
        h = hues[d]
        base = np.array(
            [abs(h * 6 - 3) - 1, 2 - abs(h * 6 - 2), 2 - abs(h * 6 - 4)]
        ).clip(0, 1)
        col = np.tile(base[None].astype(np.float32), (gauss_per_domino, 1))
        col *= rng.uniform(0.75, 1.0, size=(gauss_per_domino, 1)).astype(np.float32)
        means_list.append(pts.astype(np.float32))
        cols_list.append(col)
        labels_list.append(np.full(gauss_per_domino, d + 1, np.int32))

    means = np.concatenate(means_list)
    cols = np.concatenate(cols_list)
    labels = np.concatenate(labels_list)
    n = means.shape[0]
    quats = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    scales = np.full((n, 3), 0.030, np.float32)
    scales[labels == 0] = [0.10, 0.10, 0.01]  # flat ground disks
    opac = np.full((n,), 0.92, np.float32)

    # orbit cameras around the row center, slightly elevated
    center = np.array([spacing * (n_dominoes - 1) / 2, 0.0, hz], np.float32)
    radius = max(2.2, spacing * n_dominoes * 0.9)
    f = 1.05 * max(width, height)
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32)
    viewmats = []
    for i in range(n_images):
        az = 2 * np.pi * i / n_images
        el = np.deg2rad(22.0 + 14.0 * ((i % 4) / 3.0))
        eye = center + radius * np.array(
            [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)],
            np.float32,
        )
        viewmats.append(_look_at_viewmat(eye, center))
    viewmats = np.stack(viewmats)
    Ks = np.tile(K, (n_images, 1, 1))
    image_names = [f"img_{i:03d}.png" for i in range(n_images)]

    # render GT images + one-hot instance features for the masks.
    # One camera per call: the jnp oracle rasterizer materializes
    # [tiles, pixels, tile_capacity] — all 32 views in one call is ~23 GB
    # on the default capacities (OOMs a 16 GB chip); per-view it's ~700 MB.
    j = jnp.asarray
    raster = (
        "packed_inference" if jax.default_backend() == "tpu" else "jax"
    )
    onehot = np.zeros((n, n_dominoes), np.float32)
    fg = labels > 0
    onehot[fg, labels[fg] - 1] = 1.0

    imgs_l, fmap_l = [], []
    for i in range(n_images):
        im, _, _ = rasterization(
            j(means), j(quats), j(scales), j(opac), j(cols),
            j(viewmats[i : i + 1]), j(Ks[i : i + 1]), width, height,
            backgrounds=jnp.full((1, 3), DOMINO_BACKGROUND),
            rasterizer=raster, tile_capacity=512, isect_exact=True,
        )
        fm, _, _ = rasterization(
            j(means), j(quats), j(scales), j(opac), j(onehot),
            j(viewmats[i : i + 1]), j(Ks[i : i + 1]), width, height,
            sh_degree=None, rasterizer=raster, tile_capacity=512,
            isect_exact=True,
        )
        imgs_l.append(np.asarray(im[0]))
        fmap_l.append(np.asarray(fm[0]))
    imgs = np.clip(np.stack(imgs_l), 0, 1)
    fmap = np.stack(fmap_l)
    masks = np.where(
        fmap.max(axis=-1) > 0.35, fmap.argmax(axis=-1) + 1, 0
    ).astype(np.int32)

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "masks", "instance_ids_npy"), exist_ok=True)
    for i, name in enumerate(image_names):
        Image.fromarray((imgs[i] * 255).astype(np.uint8)).save(
            os.path.join(root, "images", name)
        )
        stem = os.path.splitext(name)[0]
        np.save(
            os.path.join(root, "masks", "instance_ids_npy",
                         f"{stem}_instance_id.npy"),
            masks[i],
        )
    # SFM points: subsample GT gaussians (what COLMAP triangulation yields)
    # sfm_points bounds the triangulated-point stand-in; it also sets the
    # trainer's init_type="sfm" starting count, which MCMC then grows by
    # 5%/refine — big rally scenes need a bigger seed to reach cap_max
    sel = rng.choice(n, size=min(n, sfm_points), replace=False)
    _write_colmap_sparse(
        os.path.join(root, "sparse", "0"), width, height, f,
        viewmats, image_names, means[sel], cols[sel],
    )
    return {
        "means": means, "quats": quats, "scales": scales,
        "opacities": opac, "colors": cols, "labels": labels,
        "viewmats": viewmats, "Ks": Ks, "images": imgs, "masks": masks,
        "half_extents": np.array([hx, hy, hz], np.float32),
        "spacing": spacing,
    }


def make_colmap_test_scene(root, n_images=8, width=64, height=48,
                           n_pts=120, seed=7):
    """Write a synthetic COLMAP scene (sparse/0 bin files + images) whose
    images are actual 3DGS renders — trainable end-to-end, used by the
    trainer tests and the benchmark harness's procedural fallback
    (reference workflow: examples/benchmarks/*.sh on MipNeRF-360 scenes)."""
    import os
    import struct

    import numpy as np
    from PIL import Image
    import jax.numpy as jnp

    from tdgs.rendering import rasterization

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    sparse = os.path.join(root, "sparse", "0")

    pts = rng.normal(size=(n_pts, 3)).astype(np.float32) * 0.4 + [0, 0, 4.0]
    cols = rng.uniform(0.2, 1.0, size=(n_pts, 3)).astype(np.float32)

    f = 70.0 * (width / 64.0)
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32)
    viewmats = []
    for i in range(n_images):
        vm = np.eye(4, dtype=np.float32)
        vm[0, 3] = 0.4 * np.cos(2 * np.pi * i / n_images)
        vm[1, 3] = 0.4 * np.sin(2 * np.pi * i / n_images)
        viewmats.append(vm)
    viewmats = np.stack(viewmats)

    # ground-truth gaussians at the points
    quats = np.tile([1.0, 0, 0, 0], (n_pts, 1)).astype(np.float32)
    scales = np.full((n_pts, 3), 0.06, np.float32)
    opac = np.full((n_pts,), 0.95, np.float32)
    img, _, _ = rasterization(
        jnp.asarray(pts), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(cols), jnp.asarray(viewmats),
        jnp.asarray(np.tile(K, (n_images, 1, 1))), width, height,
        backgrounds=jnp.zeros((n_images, 3)),
    )
    img = np.clip(np.asarray(img), 0, 1)

    with open(os.path.join(sparse, "cameras.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", 1))
        fd.write(struct.pack("<iiQQ", 1, 1, width, height))
        fd.write(struct.pack("<4d", f, f, width / 2, height / 2))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            fd.write(struct.pack("<q", i + 1))
            fd.write(struct.pack("<3d", *pts[i]))
            fd.write(struct.pack("<3B", *(cols[i] * 255).astype(np.uint8)))
            fd.write(struct.pack("<d", 0.5))
            fd.write(struct.pack("<Q", 0))
    with open(os.path.join(sparse, "images.bin"), "wb") as fd:
        fd.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            name = f"img_{i:03d}.png"
            fd.write(struct.pack("<i", i + 1))
            fd.write(struct.pack("<4d", 1.0, 0, 0, 0))
            fd.write(struct.pack("<3d", *viewmats[i, :3, 3]))
            fd.write(struct.pack("<i", 1))
            fd.write(name.encode() + b"\x00")
            fd.write(struct.pack("<Q", 0))
            Image.fromarray((img[i] * 255).astype(np.uint8)).save(
                os.path.join(root, "images", name)
            )


def make_rich_scene(root, n_images=40, width=1236, height=822,
                    n_gt=150_000, sfm_points=40_000, seed=11,
                    extent=4.0):
    """Write a visually rich procedural COLMAP scene for quality-at-scale
    benchmarks (the stand-in for the reference's MipNeRF-360 captures —
    examples/benchmarks/mcmc.sh trains 0.36M-4M gaussians against such
    scenes; this image has no network egress so captured data can't be
    downloaded).

    Content is built to *need* densification: a noisy multi-frequency
    terrain with high-frequency procedural texture, a scatter of boxes and
    ellipsoids at varied scales/colors, and thin pillars — rendered from
    two orbit rings of cameras at MipNeRF-360-like resolution. GT splats
    are written as renders; a random subsample plays the part of the
    COLMAP triangulation (``sfm_points``).
    """
    import os

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tdgs.rendering import rasterization

    rng = np.random.default_rng(seed)
    S = extent

    def tex(p):
        """Procedural high-frequency color texture over 3D points."""
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        r = 0.5 + 0.25 * np.sin(3.1 * x) * np.cos(2.3 * y) \
            + 0.15 * np.sin(9.7 * x + 5.1 * y)
        g = 0.5 + 0.25 * np.cos(2.7 * x + 1.1) * np.sin(3.7 * y) \
            + 0.15 * np.sin(8.3 * y + 3.7 * z)
        b = 0.45 + 0.3 * np.sin(1.9 * x + 2.9 * y + 4.1 * z) \
            + 0.1 * np.cos(11.3 * x)
        c = np.stack([r, g, b], -1)
        c += rng.uniform(-0.04, 0.04, c.shape)
        return np.clip(c, 0.02, 1.0).astype(np.float32)

    def terrain_z(xy):
        x, y = xy[:, 0], xy[:, 1]
        return (0.35 * np.sin(1.1 * x) * np.cos(0.9 * y)
                + 0.18 * np.sin(2.6 * x + 1.3) * np.sin(2.1 * y)
                + 0.08 * np.sin(5.3 * x + 2.1 * y)).astype(np.float32)

    n_ground = int(n_gt * 0.55)
    gxy = rng.uniform(-S, S, size=(n_ground, 2)).astype(np.float32)
    gz = terrain_z(gxy)[:, None]
    ground = np.concatenate([gxy, gz], 1)

    # objects: boxes, ellipsoids, pillars scattered on the terrain
    n_obj = 28
    obj_budget = n_gt - n_ground
    per_obj = obj_budget // n_obj
    objs, obj_scale_mult = [], []
    for i in range(n_obj):
        cx, cy = rng.uniform(-0.75 * S, 0.75 * S, 2)
        base_z = float(terrain_z(np.array([[cx, cy]], np.float32))[0])
        kind = i % 3
        if kind == 0:  # box
            he = rng.uniform(0.15, 0.55, 3)
            pts = _sample_box_surface(rng, per_obj, he)
            pts[:, 2] += he[2]
        elif kind == 1:  # ellipsoid
            he = rng.uniform(0.15, 0.5, 3)
            u = rng.normal(size=(per_obj, 3))
            u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-9
            pts = (u * he).astype(np.float32)
            pts[:, 2] += he[2]
        else:  # thin pillar
            he = np.array([0.08, 0.08, rng.uniform(0.6, 1.2)])
            pts = _sample_box_surface(rng, per_obj, he)
            pts[:, 2] += he[2]
        pts[:, 0] += cx
        pts[:, 1] += cy
        pts[:, 2] += base_z
        objs.append(pts.astype(np.float32))
        obj_scale_mult.append(np.full(per_obj, 0.7, np.float32))

    means = np.concatenate([ground] + objs)
    n = means.shape[0]
    cols = tex(means)
    quats = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    # splat sizes ~ local sample spacing (ground denser -> smaller)
    g_scale = 2.2 * S / np.sqrt(n_ground)
    scales = np.full((n, 3), g_scale, np.float32)
    scales[n_ground:] *= np.concatenate(obj_scale_mult)[:, None] * 0.8
    opac = np.full((n,), 0.9, np.float32)

    # cameras: two orbit rings + a high ring, all looking at the center
    center = np.array([0.0, 0.0, 0.25], np.float32)
    f = 0.82 * max(width, height)
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32)
    viewmats = []
    for i in range(n_images):
        az = 2 * np.pi * i / n_images * 3.0  # three loops
        ring = i * 3 // n_images  # 0,1,2
        el = np.deg2rad((18.0, 32.0, 50.0)[ring])
        radius = (1.45, 1.25, 1.1)[ring] * S
        eye = center + radius * np.array(
            [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)],
            np.float32,
        )
        viewmats.append(_look_at_viewmat(eye, center))
    viewmats = np.stack(viewmats)
    Ks = np.tile(K, (n_images, 1, 1))
    image_names = [f"img_{i:03d}.png" for i in range(n_images)]

    raster = (
        "packed_inference" if jax.default_backend() == "tpu" else "jax"
    )
    j = jnp.asarray
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    from tdgs.ops.tiling import derive_isect_capacity

    cap = derive_isect_capacity(
        j(means), j(quats), j(scales), j(opac),
        j(viewmats[:1]), j(Ks[:1]), width, height,
    )
    for i in range(n_images):
        im, _, _ = rasterization(
            j(means), j(quats), j(scales), j(opac), j(cols),
            j(viewmats[i : i + 1]), j(Ks[i : i + 1]), width, height,
            backgrounds=jnp.full((1, 3), 0.05),
            rasterizer=raster, isect_capacity=int(cap),
            tile_capacity=2048,
        )
        arr = np.clip(np.asarray(im[0]), 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            os.path.join(root, "images", image_names[i])
        )

    sel = rng.choice(n, size=min(n, sfm_points), replace=False)
    _write_colmap_sparse(
        os.path.join(root, "sparse", "0"), width, height, f,
        viewmats, image_names, means[sel], cols[sel],
    )
    return {
        "means": means, "quats": quats, "scales": scales,
        "opacities": opac, "colors": cols,
        "viewmats": viewmats, "Ks": Ks,
    }
