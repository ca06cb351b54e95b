"""Gaussian-sharded multi-device rendering (shard_map + ICI collectives).

The TPU-native equivalent of the reference's distributed rasterization
(gsplat/rendering.py:360-611 + gsplat/distributed.py, the design of
"On Scaling Up 3DGS Training", arXiv:2406.18533):

reference (NCCL, per rank)                 this module (one shard_map)
--------------------------------           ---------------------------------
all_gather cameras from all ranks          lax.all_gather over the mesh axis
project local gaussians x all cameras      same, on the local shard
all_to_all splats by target rank           lax.all_to_all: [C, n] -> [C/D, N]
  (packed by per-camera visibility,
   global<->local id remaps)                 (dense with radii-mask validity —
                                              no remap bookkeeping needed)
rasterize local cameras                    same
differentiable collectives via            XLA collectives are differentiable
  torch.distributed.nn.functional           by construction

Everything lives inside ONE shard_map region so XLA can overlap the
all_to_all with projection/SH compute over ICI.

Sharding contract: gaussians sharded on axis 0 across the mesh axis;
cameras sharded on axis 0 (each device renders its own C/D cameras, as the
reference requires equal per-rank camera counts).

Rasterizer selection mirrors single-device ``rasterization()``:
"jax" (jnp oracle), "pallas" (prototype kernel), "packed" (production
streaming Pallas kernel with custom VJP — the training fast path), and
"packed_inference" (fastest, forward-only).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tdgs.parallel import comm
from tdgs.ops.projection import fully_fused_projection
from tdgs.ops.rasterize_jax import rasterize_to_pixels_jax
from tdgs.ops.sh import spherical_harmonics
from tdgs.ops.tiling import isect_offset_encode, isect_tiles

_RENDER_MODES = ("RGB", "D", "ED", "RGB+D", "RGB+ED")


def rasterization_sharded(
    means: jnp.ndarray,  # [N, 3] sharded ("gauss")
    quats: jnp.ndarray,  # [N, 4]
    scales: jnp.ndarray,  # [N, 3]
    opacities: jnp.ndarray,  # [N]
    colors: jnp.ndarray,  # [N, K, 3] SH or [N, D]
    viewmats: jnp.ndarray,  # [C, 4, 4] sharded ("gauss" axis = camera shards)
    Ks: jnp.ndarray,  # [C, 3, 3]
    width: int,
    height: int,
    mesh: Mesh,
    axis_name: str = "gauss",
    sh_degree: Optional[int] = None,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    eps2d: float = 0.3,
    radius_clip: float = 0.0,
    tile_size: int = 16,
    backgrounds: Optional[jnp.ndarray] = None,  # [C, D] camera-sharded
    render_mode: str = "RGB",
    rasterize_mode: str = "classic",
    isect_capacity: Optional[int] = None,
    tile_capacity: int = 512,
    max_tiles_per_gauss: int = 32,
    rasterizer: str = "jax",
    means2d_offset: Optional[jnp.ndarray] = None,  # [C, N, 2] gauss-sharded
    means2d_abs_tap: Optional[jnp.ndarray] = None,  # [C, N, 2] gauss-sharded
    camera_model: str = "pinhole",
    with_ut: bool = False,
    batch_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Collaboratively render C cameras from N gaussians sharded over the mesh.

    Returns (render_colors [C, H, W, X], render_alphas [C, H, W, 1], meta)
    with outputs sharded by camera; X follows ``render_mode`` exactly like
    single-device ``rasterization()``. Differentiable w.r.t. all gaussian
    inputs — gradients flow back through the all_to_all to each gaussian's
    home device (no gradient all-reduce, matching the reference's ownership
    model). ``rasterize_mode="antialiased"`` applies the projection blur
    compensation to opacities (reference rendering.py antialiased mode).

    ``means2d_offset`` is the screen-gradient tap for densification (same
    contract as single-device ``rasterization``): a zeros array [C, N, 2]
    sharded like the gaussians on axis 1, added to the projected means2d
    *before* the all_to_all so its gradient arrives gaussian-sharded on
    each owner device. ``means2d_abs_tap`` is the AbsGS |grad| tap (same
    shape/sharding): its gradient accumulates |per-(gaussian, tile)| screen
    gradients, exchanged back through the all_to_all transpose to each
    gaussian's owner — supported by the "packed" and "jax" rasterizers,
    exactly like single-device. ``meta["radii"]`` carries the pre-exchange
    radii [C, N, 2] for visibility masks (selective Adam / strategy state)
    and ``meta["means2d"]`` the pre-exchange projected centers [C, N, 2]
    (differentiable — the normal-supervision losses sample maps at them).

    ``colors`` may also be per-camera features [C, N, D] (``sh_degree``
    None), camera axis replicated-per-column and gaussian axis sharded —
    the appearance-MLP path: each device computes colors for its local
    gaussians against every camera, and the exchange ships them like SH
    colors (reference simple_trainer.py:585-593 + rendering.py:530-611,
    where app_opt trains under DDP with no feature carve-out).

    ``batch_axis`` names an optional second mesh axis for a 2-D
    (data-parallel x gaussian-sharded) layout: cameras split over
    ``(batch_axis, axis_name)`` while gaussians stay sharded on
    ``axis_name`` and replicate over ``batch_axis``. Each batch column
    runs the same gather->project->all_to_all exchange over its own
    gaussian sub-axis — collectives never cross the batch axis, so frame
    throughput scales with the batch dimension while the scene still
    outgrows one chip's HBM along the gauss dimension.
    """
    D_mesh = mesh.shape[axis_name]
    B_mesh = mesh.shape[batch_axis] if batch_axis is not None else 1
    C = viewmats.shape[0]
    N = means.shape[0]
    assert C % (D_mesh * B_mesh) == 0, (
        f"cameras {C} must divide over {D_mesh}x{B_mesh} devices"
    )
    assert render_mode in _RENDER_MODES, render_mode
    assert rasterize_mode in ("classic", "antialiased"), rasterize_mode
    assert rasterizer in ("jax", "pallas", "packed", "packed_inference")
    calc_compensations = rasterize_mode == "antialiased"
    need_depth = render_mode in ("D", "ED", "RGB+D", "RGB+ED")
    depth_only = render_mode in ("D", "ED")

    has_bkgd = backgrounds is not None
    has_offset = means2d_offset is not None
    has_abs_tap = means2d_abs_tap is not None
    colors_per_cam = sh_degree is None and colors.ndim == 3
    if has_abs_tap:
        assert rasterizer in ("packed", "jax"), (
            "means2d_abs_tap is supported by the 'jax' and 'packed' "
            "rasterizers (differentiable paths)"
        )

    def local_fn(means, quats, scales, opacities, colors, viewmats, Ks,
                 *extras):
        # means etc: local shard [n, ...]; viewmats: local cameras [c, 4, 4]
        extras = list(extras)
        bkgd_in = extras.pop(0) if has_bkgd else None
        offset_in = extras.pop(0) if has_offset else None  # [C, n, 2]
        abs_tap_in = extras.pop(0) if has_abs_tap else None  # [C, n, 2]
        n = means.shape[0]
        # (1) gather this batch column's cameras (reference
        # rendering.py:366-381); with batch_axis the gather stays inside
        # the column, so c_all = C / B_mesh
        viewmats_all = comm.all_gather(viewmats, axis_name)
        Ks_all = comm.all_gather(Ks, axis_name)
        c_all = viewmats_all.shape[0]

        # (2) project local gaussians against the column's cameras
        radii, means2d, depths, conics, compensations = fully_fused_projection(
            means, quats, scales, viewmats_all, Ks_all, width, height,
            eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
            radius_clip=radius_clip, opacities=opacities,
            calc_compensations=calc_compensations,
            camera_model=camera_model,
        )  # [C, n, ...]
        if offset_in is not None:
            # densification tap: grads w.r.t. it = screen-space means2d
            # grads, delivered gaussian-sharded to each owner device
            means2d = means2d + offset_in

        # (3) colors for the column's cameras
        if colors_per_cam:
            cols = colors  # [c_all, n, D] appearance-MLP per-camera colors
        elif sh_degree is None:
            cols = jnp.broadcast_to(colors[None], (c_all,) + colors.shape)
        else:
            campos = jnp.linalg.inv(viewmats_all)[:, :3, 3]
            dirs = means[None, :, :] - campos[:, None, :]
            masks = (radii > 0).all(-1)
            shs = jnp.broadcast_to(colors[None], (c_all,) + colors.shape)
            cols = spherical_harmonics(sh_degree, dirs, shs, masks=masks)
            cols = jnp.maximum(cols + 0.5, 0.0)

        opac = jnp.broadcast_to(opacities[None], (c_all, n))
        if calc_compensations:
            opac = opac * compensations

        # (4) exchange: camera-major -> gaussian-major
        #     [C, n, ...] -> [C/D, N, ...]: each device keeps its own cameras
        #     but receives every device's gaussians for them.
        def a2a(x):
            return comm.all_to_all(x, axis_name, split_axis=0, concat_axis=1)

        radii_l = a2a(radii)
        means2d_l = a2a(means2d)
        depths_l = a2a(depths)
        conics_l = a2a(conics)
        opac_l = a2a(opac)
        abs_tap_l = None if abs_tap_in is None else a2a(abs_tap_in)
        if depth_only:
            # D/ED: the depth IS the single channel — skip the color exchange
            cols_l = depths_l[..., None]
        else:
            cols_l = a2a(cols)
            if need_depth:
                cols_l = jnp.concatenate(
                    [cols_l, depths_l[..., None]], axis=-1
                )

        bkgd = bkgd_in
        if bkgd is not None:
            dch = cols_l.shape[-1]
            if bkgd.shape[-1] < dch:  # zero background on the depth channel
                bkgd = jnp.concatenate(
                    [bkgd, jnp.zeros(bkgd.shape[:-1] + (dch - bkgd.shape[-1],),
                                     bkgd.dtype)], axis=-1,
                )
            elif depth_only:
                bkgd = jnp.zeros(bkgd.shape[:-1] + (1,), bkgd.dtype)

        c_local = radii_l.shape[0]
        tile_width = math.ceil(width / tile_size)
        tile_height = math.ceil(height / tile_size)
        cap = isect_capacity or max(1 << 14, c_local * N * 4)

        if rasterizer in ("packed", "packed_inference"):
            from tdgs.ops.rasterize_pallas_packed import (
                rasterize_to_pixels_packed,
                rasterize_to_pixels_packed_inference,
            )
            from tdgs.ops.tiling import isect_tiles_packed

            isect = isect_tiles_packed(
                jax.lax.stop_gradient(means2d_l), radii_l,
                jax.lax.stop_gradient(depths_l),
                tile_size, tile_width, tile_height,
                max_tiles_per_gauss=max_tiles_per_gauss,
                capacity=isect_capacity,
            )
            raster_fn = (
                rasterize_to_pixels_packed_inference
                if rasterizer == "packed_inference"
                else rasterize_to_pixels_packed
            )
            extra_kw = {}
            if abs_tap_l is not None:
                c_loc = radii_l.shape[0]
                extra_kw["absgrad_dummy"] = abs_tap_l.reshape(c_loc * N, 2)
            img, alpha = raster_fn(
                means2d_l, conics_l, cols_l, opac_l, width, height,
                tile_size, isect.offsets, isect.flatten_ids,
                backgrounds=bkgd, tile_capacity=tile_capacity,
                **extra_kw,
            )
        else:
            isect = isect_tiles(
                jax.lax.stop_gradient(means2d_l), radii_l,
                jax.lax.stop_gradient(depths_l),
                tile_size, tile_width, tile_height,
                capacity=cap, max_tiles_per_gauss=max_tiles_per_gauss,
            )
            offsets = isect_offset_encode(
                isect.isect_keys, c_local, tile_width, tile_height
            )
            if rasterizer == "pallas":
                from tdgs.ops.rasterize_pallas import (
                    rasterize_to_pixels_pallas,
                )

                raster_fn = rasterize_to_pixels_pallas
            else:
                raster_fn = rasterize_to_pixels_jax
            extra_kw = {}
            if abs_tap_l is not None:
                c_loc = radii_l.shape[0]
                extra_kw["absgrad_dummy"] = abs_tap_l.reshape(c_loc * N, 2)
            img, alpha = raster_fn(
                means2d_l, conics_l, cols_l, opac_l, width, height,
                tile_size, offsets, isect.flatten_ids, isect.n_isects,
                backgrounds=bkgd, tile_capacity=tile_capacity,
                **extra_kw,
            )
        if render_mode in ("ED", "RGB+ED"):
            img = jnp.concatenate(
                [img[..., :-1],
                 img[..., -1:] / jnp.maximum(alpha, 1e-10)], axis=-1,
            )
        # n_dropped: [1] per device → [D]; radii/means2d pre-exchange:
        # [C, n] local → [C, N] global (gaussian axis restored by the
        # out_spec concat)
        return img, alpha, isect.n_dropped[None], radii, means2d

    cam_spec = (
        P((batch_axis, axis_name)) if batch_axis is not None
        else P(axis_name)
    )
    gauss_spec = P(axis_name)  # replicated over batch_axis by omission
    tap_spec = (
        P(batch_axis, axis_name) if batch_axis is not None
        else P(None, axis_name)
    )
    in_specs = [gauss_spec] * 4 + [tap_spec if colors_per_cam else gauss_spec]
    in_specs += [cam_spec, cam_spec]
    args = [means, quats, scales, opacities, colors, viewmats, Ks]
    if has_bkgd:
        in_specs.append(cam_spec)
        args.append(backgrounds)
    if has_offset:
        in_specs.append(tap_spec)
        args.append(means2d_offset)
    if has_abs_tap:
        in_specs.append(tap_spec)
        args.append(means2d_abs_tap)
    shard = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(cam_spec, cam_spec, cam_spec, tap_spec, tap_spec),
        check_vma=False,
    )
    img, alpha, n_dropped, radii, means2d_out = shard(*args)
    meta = {
        "n_dropped": n_dropped, "width": width, "height": height,
        "radii": radii, "means2d": means2d_out,
    }
    return img, alpha, meta


def rasterization_2dgs_sharded(
    means: jnp.ndarray,  # [N, 3] sharded ("gauss")
    quats: jnp.ndarray,  # [N, 4]
    scales: jnp.ndarray,  # [N, 3]
    opacities: jnp.ndarray,  # [N]
    colors: jnp.ndarray,  # [N, K, 3] SH or [N, D]
    viewmats: jnp.ndarray,  # [C, 4, 4] sharded (camera shards)
    Ks: jnp.ndarray,  # [C, 3, 3]
    width: int,
    height: int,
    mesh: Mesh,
    axis_name: str = "gauss",
    sh_degree: Optional[int] = None,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    tile_size: int = 16,
    backgrounds: Optional[jnp.ndarray] = None,  # [C, D] camera-sharded
    distloss: bool = False,
    render_mode: str = "RGB",
    isect_capacity: Optional[int] = None,
    tile_capacity: int = 512,
    max_tiles_per_gauss: int = 32,
    rasterizer: str = "jax",
    means2d_offset: Optional[jnp.ndarray] = None,  # [C, N, 2] gauss-sharded
    means2d_abs_tap: Optional[jnp.ndarray] = None,  # [C, N, 2] gauss-sharded
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           Dict]:
    """2DGS (surfel) counterpart of ``rasterization_sharded``: the same
    gather→project→all_to_all→rasterize exchange, but shipping ray-space
    transforms M [.., 3, 3] and camera-frame normals instead of conics.
    Returns (render_colors [C, H, W, D], render_alphas, render_normals,
    render_distort, render_median, meta), camera-sharded; differentiable
    w.r.t. all gaussian inputs through the all_to_all (median is
    non-differentiable, as on one device). ``means2d_abs_tap`` is the AbsGS
    |grad| tap (same contract as ``rasterization_sharded``); the |·|
    accumulations ride the all_to_all's transpose back to each gaussian's
    owner device."""
    from tdgs.ops.projection_2dgs import fully_fused_projection_2dgs

    D_mesh = mesh.shape[axis_name]
    C = viewmats.shape[0]
    N = means.shape[0]
    assert C % D_mesh == 0, f"cameras {C} must divide over {D_mesh} devices"
    assert rasterizer in ("jax", "packed", "packed_inference")
    assert render_mode in ("RGB", "RGB+ED"), render_mode
    need_depth = distloss or render_mode == "RGB+ED"
    has_bkgd = backgrounds is not None
    has_offset = means2d_offset is not None
    has_abs_tap = means2d_abs_tap is not None
    if has_abs_tap:
        assert rasterizer in ("packed", "jax"), (
            "means2d_abs_tap is supported by the 'jax' and 'packed' "
            "rasterizers (differentiable paths)"
        )

    def local_fn(means, quats, scales, opacities, colors, viewmats, Ks,
                 *extras):
        extras = list(extras)
        bkgd_in = extras.pop(0) if has_bkgd else None
        offset_in = extras.pop(0) if has_offset else None  # [C, n, 2]
        abs_tap_in = extras.pop(0) if has_abs_tap else None  # [C, n, 2]
        n = means.shape[0]
        viewmats_all = comm.all_gather(viewmats, axis_name)
        Ks_all = comm.all_gather(Ks, axis_name)

        radii, means2d, depths, M, normals = fully_fused_projection_2dgs(
            means, quats, scales, viewmats_all, Ks_all, width, height,
            near_plane=near_plane, far_plane=far_plane,
            radius_clip=radius_clip,
        )  # [C, n, ...]
        if offset_in is not None:
            # densification tap: grads arrive gaussian-sharded through
            # the all_to_all, like rasterization_sharded's
            means2d = means2d + offset_in

        if sh_degree is None:
            cols = jnp.broadcast_to(colors[None], (C,) + colors.shape)
        else:
            campos = jnp.linalg.inv(viewmats_all)[:, :3, 3]
            dirs = means[None, :, :] - campos[:, None, :]
            masks = (radii > 0).all(-1)
            shs = jnp.broadcast_to(colors[None], (C,) + colors.shape)
            cols = spherical_harmonics(sh_degree, dirs, shs, masks=masks)
            cols = jnp.maximum(cols + 0.5, 0.0)
        opac = jnp.broadcast_to(opacities[None], (C, n))

        def a2a(x):
            return comm.all_to_all(x, axis_name, split_axis=0, concat_axis=1)

        radii_l = a2a(radii)
        means2d_l = a2a(means2d)
        depths_l = a2a(depths)
        abs_tap_l = None if abs_tap_in is None else a2a(abs_tap_in)
        M_l = a2a(M.reshape(C, n, 9)).reshape(-1, N, 3, 3)
        normals_l = a2a(normals)
        opac_l = a2a(opac)
        cols_l = a2a(cols)
        if need_depth:
            cols_l = jnp.concatenate(
                [cols_l, depths_l[..., None]], axis=-1
            )

        bkgd = bkgd_in
        if bkgd is not None and need_depth:
            bkgd = jnp.concatenate(
                [bkgd, jnp.zeros(bkgd.shape[:-1] + (1,), bkgd.dtype)],
                axis=-1,
            )

        c_local = radii_l.shape[0]
        tile_width = math.ceil(width / tile_size)
        tile_height = math.ceil(height / tile_size)
        cap = isect_capacity or max(1 << 14, c_local * N * 4)

        if rasterizer in ("packed", "packed_inference"):
            from tdgs.ops.rasterize_2dgs_pallas import (
                rasterize_to_pixels_2dgs_packed,
                rasterize_to_pixels_2dgs_packed_inference,
            )
            from tdgs.ops.tiling import isect_tiles_packed

            isect = isect_tiles_packed(
                jax.lax.stop_gradient(means2d_l), radii_l,
                jax.lax.stop_gradient(depths_l),
                tile_size, tile_width, tile_height,
                max_tiles_per_gauss=max_tiles_per_gauss,
                capacity=isect_capacity,
            )
            if rasterizer == "packed_inference":
                img, alpha, nrm = rasterize_to_pixels_2dgs_packed_inference(
                    means2d_l, M_l, cols_l, normals_l, opac_l, width,
                    height, tile_size, isect.offsets, isect.flatten_ids,
                    backgrounds=bkgd, tile_capacity=tile_capacity,
                )
                dist = jnp.zeros_like(alpha)
                med = jnp.zeros_like(alpha)
            else:
                extra_kw = {}
                if abs_tap_l is not None:
                    c_loc = radii_l.shape[0]
                    extra_kw["absgrad_dummy"] = abs_tap_l.reshape(
                        c_loc * N, 2
                    )
                img, alpha, nrm, dist, med = rasterize_to_pixels_2dgs_packed(
                    means2d_l, M_l, cols_l, normals_l, opac_l, width,
                    height, tile_size, isect.offsets, isect.flatten_ids,
                    backgrounds=bkgd, tile_capacity=tile_capacity,
                    has_depth=need_depth, compute_distort=distloss,
                    **extra_kw,
                )
        else:
            from tdgs.ops.rasterize_2dgs_jax import (
                rasterize_to_pixels_2dgs_jax,
            )

            isect = isect_tiles(
                jax.lax.stop_gradient(means2d_l), radii_l,
                jax.lax.stop_gradient(depths_l),
                tile_size, tile_width, tile_height,
                capacity=cap, max_tiles_per_gauss=max_tiles_per_gauss,
            )
            offsets = isect_offset_encode(
                isect.isect_keys, c_local, tile_width, tile_height
            )
            extra_kw = {}
            if abs_tap_l is not None:
                c_loc = radii_l.shape[0]
                extra_kw["absgrad_dummy"] = abs_tap_l.reshape(c_loc * N, 2)
            img, alpha, nrm, dist, med = rasterize_to_pixels_2dgs_jax(
                means2d_l, M_l, cols_l, normals_l, opac_l, width, height,
                tile_size, offsets, isect.flatten_ids, isect.n_isects,
                backgrounds=bkgd, tile_capacity=tile_capacity,
                compute_distort=distloss,
                **extra_kw,
            )
        if need_depth and render_mode != "RGB+ED":
            img = img[..., :-1]  # drop the carried depth channel
        elif render_mode == "RGB+ED":
            # expected depth: normalize the accumulated channel by alpha
            img = jnp.concatenate(
                [img[..., :-1],
                 img[..., -1:] / jnp.maximum(alpha, 1e-10)], axis=-1,
            )
        return (img, alpha, nrm, dist, med, isect.n_dropped[None], radii,
                means2d)

    in_specs = [P(axis_name)] * 7
    args = [means, quats, scales, opacities, colors, viewmats, Ks]
    if has_bkgd:
        in_specs.append(P(axis_name))
        args.append(backgrounds)
    if has_offset:
        in_specs.append(P(None, axis_name))
        args.append(means2d_offset)
    if has_abs_tap:
        in_specs.append(P(None, axis_name))
        args.append(means2d_abs_tap)
    shard = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=tuple([P(axis_name)] * 6)
        + (P(None, axis_name), P(None, axis_name)),
        check_vma=False,
    )
    img, alpha, nrm, dist, med, n_dropped, radii, means2d_out = shard(*args)
    meta = {
        "n_dropped": n_dropped, "width": width, "height": height,
        "radii": radii, "means2d": means2d_out,
    }
    return img, alpha, nrm, dist, med, meta


def rasterization_eval3d_sharded(
    means: jnp.ndarray,  # [N, 3] sharded ("gauss")
    quats: jnp.ndarray,  # [N, 4]
    scales: jnp.ndarray,  # [N, 3]
    opacities: jnp.ndarray,  # [N]
    colors: jnp.ndarray,  # [N, K, 3] SH or [N, D]
    viewmats: jnp.ndarray,  # [C, 4, 4] sharded (camera shards)
    Ks: jnp.ndarray,  # [C, 3, 3]
    width: int,
    height: int,
    mesh: Mesh,
    axis_name: str = "gauss",
    sh_degree: Optional[int] = None,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    eps2d: float = 0.3,
    radius_clip: float = 0.0,
    tile_size: int = 16,
    backgrounds: Optional[jnp.ndarray] = None,  # [C, D] camera-sharded
    camera_model: str = "pinhole",
    isect_capacity: Optional[int] = None,
    tile_capacity: int = 512,
    max_tiles_per_gauss: int = 32,
    with_ut: bool = False,
    radial_coeffs: Optional[jnp.ndarray] = None,  # [C, 6|4] camera-sharded
    tangential_coeffs: Optional[jnp.ndarray] = None,  # [C, 2]
    thin_prism_coeffs: Optional[jnp.ndarray] = None,  # [C, 4]
    ftheta_coeffs=None,  # FThetaCameraDistortionParameters (static)
    rolling_shutter=None,  # RollingShutterType
    viewmats_rs: Optional[jnp.ndarray] = None,  # [C, 4, 4] camera-sharded
    render_mode: str = "RGB",
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """World-space (eval3d / 3DGUT) sharded rendering — the multi-device
    counterpart of ``rasterization(..., rasterizer="eval3d_packed")``.

    ``render_mode`` supports the full set (RGB / RGB+D / RGB+ED / D / ED):
    depth rides the exchange as an extra accumulated channel exactly like
    the single-device path (reference rendering.py:614-629 appends depth
    channels before the eval3d rasterize at :668-759).

    Supports every central camera model of the single-device path
    (pinhole / OpenCV-distorted pinhole / fisheye / FTheta) plus the four
    rolling-shutter modes — the reference's distributed mode has no camera
    carve-outs (gsplat/rendering.py:366-611) and neither does this one.
    Screen-space tile bounds come from the UT projection when distortion /
    rolling shutter is in play (``with_ut`` or any coeffs given), with the
    per-camera distortion arrays gathered alongside viewmats/Ks; per-tile
    world rays are built locally per camera after the exchange, so ray
    distortion needs no collective at all.

    The exchange ships the per-(camera, gaussian) world-space response
    features (w = Σ⁻¹μ', |μ'|²_Σ, the 6 precision components, opacity,
    SH-evaluated colors) instead of 2D conics. Differentiable w.r.t.
    all gaussian inputs and the camera poses (pose-opt), exactly like
    the single-device path. ``colors`` may be per-camera features
    [C, N, D] (appearance MLP), gaussian axis sharded."""
    import math as _math

    from tdgs.ops.camera_models import RollingShutterType
    from tdgs.ops.rasterize_eval3d_pallas import (
        _raster_eval3d_core,
        _tile_rays_world,
        CHUNK as _CHUNK,
    )
    from tdgs.ops.transforms import quat_scale_to_covar_sym6

    D_mesh = mesh.shape[axis_name]
    C = viewmats.shape[0]
    N = means.shape[0]
    assert C % D_mesh == 0, f"cameras {C} must divide over {D_mesh} devices"
    if rolling_shutter is None:
        rolling_shutter = RollingShutterType.GLOBAL
    use_rs = (
        viewmats_rs is not None
        and rolling_shutter != RollingShutterType.GLOBAL
    )
    use_ut = (
        with_ut
        or camera_model != "pinhole"
        or use_rs
        or any(
            c is not None
            for c in (radial_coeffs, tangential_coeffs, thin_prism_coeffs)
        )
    )
    colors_per_cam = sh_degree is None and colors.ndim == 3
    assert render_mode in _RENDER_MODES, render_mode
    need_depth = render_mode in ("D", "ED", "RGB+D", "RGB+ED")
    depth_only = render_mode in ("D", "ED")
    tile_width = _math.ceil(width / tile_size)
    tile_height = _math.ceil(height / tile_size)

    def local_fn(means, quats, scales, opacities, colors, viewmats, Ks,
                 *extras):
        extras = list(extras)
        radial_in = extras.pop(0) if radial_coeffs is not None else None
        tangential_in = (
            extras.pop(0) if tangential_coeffs is not None else None
        )
        thin_prism_in = (
            extras.pop(0) if thin_prism_coeffs is not None else None
        )
        vm_rs_in = extras.pop(0) if viewmats_rs is not None else None
        bkgd_in = extras.pop(0) if backgrounds is not None else None
        n = means.shape[0]
        viewmats_all = comm.all_gather(viewmats, axis_name)
        Ks_all = comm.all_gather(Ks, axis_name)

        def gather_opt(x):
            return None if x is None else comm.all_gather(x, axis_name)

        # screen-space projection of the local shard for tiling only —
        # UT projection when the camera model bends rays (3DGUT)
        if use_ut:
            from tdgs.ops.projection_ut import fully_fused_projection_with_ut

            radii, means2d, depths, _conics, _ = (
                fully_fused_projection_with_ut(
                    means, quats, scales, opacities, viewmats_all, Ks_all,
                    width, height, eps2d=eps2d, near_plane=near_plane,
                    far_plane=far_plane, radius_clip=radius_clip,
                    camera_model=camera_model,
                    radial_coeffs=gather_opt(radial_in),
                    tangential_coeffs=gather_opt(tangential_in),
                    thin_prism_coeffs=gather_opt(thin_prism_in),
                    ftheta_coeffs=ftheta_coeffs,
                    rolling_shutter=rolling_shutter,
                    viewmats_rs=gather_opt(vm_rs_in),
                )
            )  # [C, n, ...]
        else:
            radii, means2d, depths, _conics, _ = fully_fused_projection(
                means, quats, scales, viewmats_all, Ks_all, width, height,
                eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
                radius_clip=radius_clip, opacities=opacities,
            )  # [C, n, ...]

        if colors_per_cam:
            cols = colors  # [C, n, D] appearance-MLP per-camera colors
        elif sh_degree is None:
            cols = jnp.broadcast_to(colors[None], (C,) + colors.shape)
        else:
            campos = jnp.linalg.inv(viewmats_all)[:, :3, 3]
            dirs = means[None, :, :] - campos[:, None, :]
            masks = (radii > 0).all(-1)
            shs = jnp.broadcast_to(colors[None], (C,) + colors.shape)
            cols = spherical_harmonics(sh_degree, dirs, shs, masks=masks)
            cols = jnp.maximum(cols + 0.5, 0.0)
        if depth_only:
            cols = depths[..., None]
        elif need_depth:
            cols = jnp.concatenate([cols, depths[..., None]], axis=-1)
        D_ch = cols.shape[-1]

        # world-space response features per (camera, local gaussian) —
        # SoA (see rasterize_eval3d_pallas.rasterize_to_pixels_eval3d_packed)
        inv_s = 1.0 / jnp.maximum(scales, 1e-8)
        p00, p01, p02, p11, p12, p22 = quat_scale_to_covar_sym6(quats, inv_s)
        prec6 = jnp.stack(
            [p00, p11, p22, 2.0 * p01, 2.0 * p02, 2.0 * p12], axis=-1
        )  # [n, 6]
        R_wc = viewmats_all[:, :3, :3]
        t_wc = viewmats_all[:, :3, 3]
        o_ref = -jnp.einsum("ikj,ik->ij", R_wc, t_wc, precision="highest")
        m0 = means[None, :, 0] - o_ref[:, None, 0]  # [C, n]
        m1 = means[None, :, 1] - o_ref[:, None, 1]
        m2 = means[None, :, 2] - o_ref[:, None, 2]
        w0 = p00 * m0 + p01 * m1 + p02 * m2
        w1 = p01 * m0 + p11 * m1 + p12 * m2
        w2 = p02 * m0 + p12 * m1 + p22 * m2
        mAm = w0 * m0 + w1 * m1 + w2 * m2  # [C, n]
        F_pad = -(-(11 + D_ch) // 8) * 8
        feats = jnp.concatenate(
            [
                jnp.stack([w0, w1, w2], axis=-1),
                mAm[..., None],
                jnp.broadcast_to(prec6[None], (C, n, 6)),
                jnp.broadcast_to(opacities[None, :, None], (C, n, 1)),
                cols,
                jnp.zeros((C, n, F_pad - 11 - D_ch), jnp.float32),
            ],
            axis=-1,
        )  # [C, n, F_pad]

        def a2a(x):
            return comm.all_to_all(x, axis_name, split_axis=0, concat_axis=1)

        radii_l = a2a(radii)
        means2d_l = a2a(means2d)
        depths_l = a2a(depths)
        feats_l = a2a(feats)  # [c_local, N, F]
        c_local = radii_l.shape[0]
        T_local = c_local * tile_width * tile_height
        P_px = tile_size * tile_size

        # per-tile world rays for the LOCAL cameras — distortion bends the
        # rays locally (no collective); rolling shutter interpolates poses
        d, o_prime, _, _ = _tile_rays_world(
            c_local, tile_width, tile_height, tile_size, width, height,
            viewmats, Ks, camera_model, radial_in, tangential_in,
            thin_prism_in, ftheta_coeffs, rolling_shutter, vm_rs_in,
        )
        rays = jnp.concatenate(
            [
                d.swapaxes(1, 2),
                o_prime.swapaxes(1, 2),
                jnp.zeros((T_local, 2, P_px), jnp.float32),
            ],
            axis=1,
        )  # [T, 8, P]

        from tdgs.ops.tiling import isect_tiles_packed

        isect = isect_tiles_packed(
            jax.lax.stop_gradient(means2d_l), radii_l,
            jax.lax.stop_gradient(depths_l),
            tile_size, tile_width, tile_height,
            max_tiles_per_gauss=max_tiles_per_gauss,
            capacity=isect_capacity,
        )
        capacity = isect.flatten_ids.shape[0]
        pad = (-capacity) % _CHUNK + _CHUNK
        # stride cliff: keep the packed minor dim >= T·CHUNK (see the
        # single-device eval3d wrapper + BENCH_BREAKDOWN_r04.md)
        if capacity + pad < T_local * _CHUNK + _CHUNK:
            pad = T_local * _CHUNK + _CHUNK - capacity
        flatten_ids = jnp.pad(isect.flatten_ids, (0, pad))
        feats_f = jax.lax.optimization_barrier(
            feats_l.reshape(c_local * N, F_pad)
        )
        packed = jax.lax.optimization_barrier(feats_f[flatten_ids]).T

        # central cameras with a global shutter have o' ≡ 0, statically
        # removing most HIGHEST MXU contractions (see single-device path)
        colors_out, trans_out = _raster_eval3d_core(
            packed, rays, isect.offsets, T_local,
            max(tile_capacity // _CHUNK, 1), D_ch, P_px, not use_rs,
        )
        pad_h = tile_height * tile_size
        pad_w = tile_width * tile_size
        img = colors_out.reshape(
            c_local, tile_height, tile_width, D_ch, tile_size, tile_size
        ).transpose(0, 1, 4, 2, 5, 3).reshape(c_local, pad_h, pad_w, D_ch)
        alp = 1.0 - trans_out.reshape(
            c_local, tile_height, tile_width, tile_size, tile_size
        ).transpose(0, 1, 3, 2, 4).reshape(c_local, pad_h, pad_w)
        img = img[:, :height, :width, :]
        alp = alp[:, :height, :width]
        if bkgd_in is not None:
            bkgd = bkgd_in
            if depth_only:
                bkgd = jnp.zeros(bkgd.shape[:-1] + (1,), bkgd.dtype)
            elif bkgd.shape[-1] < D_ch:  # zero background on depth channel
                bkgd = jnp.concatenate(
                    [bkgd, jnp.zeros(
                        bkgd.shape[:-1] + (D_ch - bkgd.shape[-1],),
                        bkgd.dtype,
                    )], axis=-1,
                )
            img = img + (1.0 - alp[..., None]) * bkgd.reshape(
                c_local, 1, 1, D_ch
            )
        if render_mode in ("ED", "RGB+ED"):
            img = jnp.concatenate(
                [img[..., :-1],
                 img[..., -1:] / jnp.maximum(alp[..., None], 1e-10)],
                axis=-1,
            )
        return img, alp[..., None], isect.n_dropped[None], radii, means2d

    in_specs = [P(axis_name)] * 4
    in_specs.append(
        P(None, axis_name) if colors_per_cam else P(axis_name)
    )
    in_specs += [P(axis_name), P(axis_name)]
    args = [means, quats, scales, opacities, colors, viewmats, Ks]
    for cam_extra in (radial_coeffs, tangential_coeffs, thin_prism_coeffs,
                      viewmats_rs):
        if cam_extra is not None:
            in_specs.append(P(axis_name))
            args.append(cam_extra)
    if backgrounds is not None:
        in_specs.append(P(axis_name))
        args.append(backgrounds)
    shard = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(axis_name), P(axis_name), P(axis_name),
                   P(None, axis_name), P(None, axis_name)),
        check_vma=False,
    )
    img, alpha, n_dropped, radii, means2d_out = shard(*args)
    meta = {
        "n_dropped": n_dropped, "width": width, "height": height,
        "radii": radii, "means2d": means2d_out,
    }
    return img, alpha, meta


def rasterization_replicated(
    means: jnp.ndarray,  # [N, 3] replicated
    quats: Optional[jnp.ndarray],
    scales: Optional[jnp.ndarray],
    opacities: jnp.ndarray,
    colors: jnp.ndarray,  # [N, K, 3] SH or [N, D]
    viewmats: jnp.ndarray,  # [C, 4, 4] camera-sharded
    Ks: jnp.ndarray,  # [C, 3, 3]
    width: int,
    height: int,
    mesh: Mesh,
    axis_name: str = "gauss",
    backgrounds: Optional[jnp.ndarray] = None,  # [C, D] camera-sharded
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Frame-parallel rendering: gaussians REPLICATED, cameras sharded.

    Each device renders its C/D cameras through the full single-device
    :func:`tdgs.rendering.rasterization` (any rasterizer / render mode /
    camera model kwarg passes through) — zero collectives in the hot path,
    so frame throughput scales ~linearly with the mesh size.

    This is the complement of :func:`rasterization_sharded`: use *that*
    when the scene outgrows one chip's HBM (it shards N and pays one
    all_to_all per frame); use *this* when the scene fits and the goal is
    throughput over many cameras/frames — trajectory videos, the rally
    rollout, batch serving. The reference gets the same effect only by
    running one full process per GPU (simple_viewer.py:21-80); here it is
    one jittable program over the mesh.
    """
    from tdgs.rendering import rasterization

    C = viewmats.shape[0]
    D_mesh = mesh.shape[axis_name]
    assert C % D_mesh == 0, f"cameras {C} must divide over {D_mesh} devices"
    assert quats is not None and scales is not None, (
        "replicated rendering takes quats/scales (covars mode: use the "
        "single-device path)"
    )
    has_bkgd = backgrounds is not None

    def local_fn(means, quats, scales, opacities, colors, viewmats, Ks,
                 *extras):
        bkgd = extras[0] if has_bkgd else None
        img, alpha, meta = rasterization(
            means, quats, scales, opacities, colors, viewmats, Ks,
            width, height, backgrounds=bkgd, **kwargs,
        )
        n_dropped = meta.get("n_dropped", jnp.zeros((), jnp.int32))
        return img, alpha, jnp.asarray(n_dropped).reshape(1)

    in_specs = [P(), P(), P(), P(), P(), P(axis_name), P(axis_name)]
    args = [means, quats, scales, opacities, colors, viewmats, Ks]
    if has_bkgd:
        in_specs.append(P(axis_name))
        args.append(backgrounds)
    shard = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        check_vma=False,
    )
    img, alpha, n_dropped = shard(*args)
    meta = {"n_dropped": n_dropped, "width": width, "height": height}
    return img, alpha, meta
