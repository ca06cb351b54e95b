"""Rendering orchestrator: project → SH → tile-sort → rasterize.

API parity with the reference's ``gsplat/rendering.py:rasterization()``
(the single most important API, SURVEY.md §2.2), redesigned for TPU:

- dense ``[..., C, N]`` intermediate layout only (the reference's
  ``packed``/``sparse_grad``/``segmented`` memory modes are CUDA-specific
  and intentionally dropped; validity is ``radii > 0`` masks),
- static-capacity intersection buffers (``isect_capacity``,
  ``tile_capacity``) instead of dynamic ``n_isects`` allocations,
- the whole pipeline is one jit-able pure function; ``meta`` carries all
  intermediates exactly like the reference so densification strategies can
  consume screen-space gradients.

Layer contract preserved from the reference: this module is a pure
orchestrator composing ops; it knows nothing about training strategies.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tdgs.ops.projection import fully_fused_projection
from tdgs.ops.rasterize_jax import rasterize_to_pixels_jax
from tdgs.ops.sh import spherical_harmonics
from tdgs.ops.tiling import isect_offset_encode, isect_tiles

RENDER_MODES = ("RGB", "D", "ED", "RGB+D", "RGB+ED")


def default_isect_capacity(I: int, N: int) -> int:
    """Heuristic static capacity for the intersection buffer: ~8 covered
    tiles per (image, gaussian), rounded up to a power of two so capacity
    changes (and re-jits) are rare."""
    cap = max(I * N * 8, 1 << 14)
    return 1 << (cap - 1).bit_length()


def rasterization(
    means: jnp.ndarray,  # [..., N, 3]
    quats: Optional[jnp.ndarray],  # [..., N, 4]
    scales: Optional[jnp.ndarray],  # [..., N, 3]
    opacities: jnp.ndarray,  # [..., N]
    colors: jnp.ndarray,  # [..., (C,) N, D] or [..., (C,) N, K, 3]
    viewmats: jnp.ndarray,  # [..., C, 4, 4]
    Ks: jnp.ndarray,  # [..., C, 3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps2d: float = 0.3,
    sh_degree: Optional[int] = None,
    tile_size: int = 16,
    backgrounds: Optional[jnp.ndarray] = None,  # [..., C, D]
    render_mode: str = "RGB",
    rasterize_mode: str = "classic",
    camera_model: str = "pinhole",
    covars: Optional[jnp.ndarray] = None,  # [..., N, 3, 3]
    isect_capacity: Optional[int] = None,
    tile_capacity: int = 1024,
    max_tiles_per_gauss: int = 32,
    isect_exact: bool = False,
    isect_exact_depth: bool = False,
    isect_split_k: Optional[int] = None,
    isect_big_capacity: Optional[int] = None,
    rasterizer: str = "jax",
    means2d_offset: Optional[jnp.ndarray] = None,  # [..., C, N, 2]
    means2d_abs_tap: Optional[jnp.ndarray] = None,  # [..., C, N, 2]
    with_ut: bool = False,
    radial_coeffs: Optional[jnp.ndarray] = None,  # [..., C, 6] or [..., C, 4]
    tangential_coeffs: Optional[jnp.ndarray] = None,  # [..., C, 2]
    thin_prism_coeffs: Optional[jnp.ndarray] = None,  # [..., C, 4]
    ftheta_coeffs=None,
    rolling_shutter=None,
    viewmats_rs: Optional[jnp.ndarray] = None,
    # --- reference drop-in kwargs (gsplat/rendering.py:33 argument set) ---
    packed: Optional[bool] = None,
    sparse_grad: bool = False,
    segmented: bool = False,
    absgrad: bool = False,
    channel_chunk: int = 32,
    distributed: bool = False,
    with_eval3d: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Rasterize N 3D Gaussians to C cameras (arbitrary leading batch dims).

    Returns (render_colors [..., C, H, W, X], render_alphas [..., C, H, W, 1],
    meta dict). See the reference docstring (gsplat/rendering.py:33-264) for
    the semantics of each argument; deltas for the TPU build:

    - ``isect_capacity``/``tile_capacity``/``max_tiles_per_gauss`` bound the
      static intersection buffers (meta reports ``n_dropped`` overflow).
    - ``rasterizer`` selects "jax" (pure-jnp oracle path, differentiable via
      autodiff) or "pallas" (production TPU kernel with custom VJP).
    - ``packed``/``sparse_grad``/``segmented``/``distributed`` are not
      arguments: dense masked layout is the TPU idiom and multi-device
      rendering lives in ``tdgs.parallel``.
    - ``absgrad`` (AbsGS) becomes the explicit ``means2d_abs_tap``: pass a
      zeros array [..., C, N, 2]; the gradient of the loss w.r.t. it is the
      per-gaussian accumulation of |per-tile screen-space gradients|
      (the reference's meta["means2d"].absgrad, per-tile instead of
      per-pixel — see rasterize_jax.absgrad_tap). Supported by the "jax"
      and "packed" rasterizers.

    Reference drop-in kwargs (accepted so gsplat call sites run unchanged):

    - ``packed`` / ``sparse_grad`` select CUDA COO layouts and ``segmented``
      a radix-sort variant — pure implementation details of the CUDA build;
      here layout is always dense masked and sorting is ``lax.sort``, so
      they are accepted and ignored.
    - ``channel_chunk``: the CUDA rasterizer templates channel counts and
      chunks wide colors; the kernels here take D as a static shape
      directly, so no chunking is needed — accepted and ignored.
    - ``absgrad=True`` requires the explicit tap (see above): without JAX
      having a ``.grad`` side channel it cannot be emulated silently, so it
      raises with the tap recipe unless ``means2d_abs_tap`` is given.
    - ``distributed=True``: single-device it is a no-op (matching the
      reference's world_size==1 path); multi-device it delegates to
      :func:`tdgs.parallel.rasterization_sharded` over a 1-D mesh of all
      devices (reference rendering.py:366-611 exchange semantics).
    - ``with_eval3d=True`` selects the world-space rasterizer (reference
      rendering.py:668-759): Pallas fast path on TPU, jnp oracle elsewhere.
    """
    if absgrad and means2d_abs_tap is None:
        raise ValueError(
            "absgrad: JAX has no tensor.grad side channel — pass "
            "means2d_abs_tap=jnp.zeros(batch + (C, N, 2)) and take the "
            "gradient of the loss w.r.t. that input (the trainer's "
            "DefaultStrategy absgrad path shows the pattern)."
        )
    del packed, sparse_grad, segmented, channel_chunk, absgrad
    if with_eval3d and not rasterizer.startswith("eval3d"):
        rasterizer = (
            "eval3d_packed" if jax.default_backend() == "tpu" else "eval3d"
        )
    if distributed and jax.device_count() > 1:
        from tdgs.parallel.mesh import make_mesh
        from tdgs.parallel.sharded_render import rasterization_sharded

        assert not means.shape[:-2], (
            "distributed=True supports unbatched [N] gaussians"
        )
        assert not rasterizer.startswith("eval3d") and not with_ut, (
            "distributed eval3d/UT: use tdgs.parallel."
            "rasterization_eval3d_sharded directly"
        )
        return rasterization_sharded(
            means, quats, scales, opacities, colors, viewmats, Ks,
            width, height, make_mesh(),
            sh_degree=sh_degree, near_plane=near_plane, far_plane=far_plane,
            eps2d=eps2d, radius_clip=radius_clip, tile_size=tile_size,
            backgrounds=backgrounds, render_mode=render_mode,
            rasterize_mode=rasterize_mode, isect_capacity=isect_capacity,
            tile_capacity=tile_capacity,
            max_tiles_per_gauss=max_tiles_per_gauss, rasterizer=rasterizer,
        )
    meta: Dict = {}
    batch_dims = means.shape[:-2]
    num_batch_dims = len(batch_dims)
    B = math.prod(batch_dims) if batch_dims else 1
    N = means.shape[-2]
    C = viewmats.shape[-3]
    I = B * C

    if covars is None:
        assert quats.shape == batch_dims + (N, 4), quats.shape
        assert scales.shape == batch_dims + (N, 3), scales.shape
    else:
        assert covars.shape == batch_dims + (N, 3, 3), covars.shape
        quats, scales = None, None
    assert opacities.shape == batch_dims + (N,), opacities.shape
    assert viewmats.shape == batch_dims + (C, 4, 4), viewmats.shape
    assert Ks.shape == batch_dims + (C, 3, 3), Ks.shape
    assert render_mode in RENDER_MODES, render_mode
    assert rasterize_mode in ("classic", "antialiased"), rasterize_mode

    calc_compensations = rasterize_mode == "antialiased"

    if with_ut:
        # UT projection (3DGUT): distorted cameras + rolling shutter
        from tdgs.ops.camera_models import RollingShutterType
        from tdgs.ops.projection_ut import fully_fused_projection_with_ut

        assert covars is None, "with_ut requires quats/scales"
        radii, means2d, depths, conics, compensations = (
            fully_fused_projection_with_ut(
                means, quats, scales, opacities, viewmats, Ks, width, height,
                eps2d=eps2d, near_plane=near_plane, far_plane=far_plane,
                radius_clip=radius_clip,
                calc_compensations=calc_compensations,
                camera_model=camera_model,
                radial_coeffs=radial_coeffs,
                tangential_coeffs=tangential_coeffs,
                thin_prism_coeffs=thin_prism_coeffs,
                ftheta_coeffs=ftheta_coeffs,
                rolling_shutter=rolling_shutter or RollingShutterType.GLOBAL,
                viewmats_rs=viewmats_rs,
            )
        )
    else:
        radii, means2d, depths, conics, compensations = fully_fused_projection(
            means,
            quats,
            scales,
            viewmats,
            Ks,
            width,
            height,
            eps2d=eps2d,
            near_plane=near_plane,
            far_plane=far_plane,
            radius_clip=radius_clip,
            calc_compensations=calc_compensations,
            camera_model=camera_model,
            opacities=opacities,
            covars=covars,
        )  # [..., C, N, ...]

    if means2d_offset is not None:
        # Zero-valued tap: grad w.r.t. this argument IS the screen-space
        # positional gradient the DefaultStrategy consumes (the JAX
        # equivalent of the reference's means2d.retain_grad(),
        # strategy/default.py:138-150).
        means2d = means2d + means2d_offset

    opacities_cn = jnp.broadcast_to(opacities[..., None, :], batch_dims + (C, N))
    if compensations is not None:
        opacities_cn = opacities_cn * compensations

    meta.update(
        {
            "camera_ids": None,
            "gaussian_ids": None,
            "radii": radii,
            "means2d": means2d,
            "depths": depths,
            "conics": conics,
            "opacities": opacities_cn,
        }
    )

    # Colors → [..., C, N, D]
    if sh_degree is None:
        if colors.ndim == num_batch_dims + 2:
            colors_cn = jnp.broadcast_to(
                colors[..., None, :, :], batch_dims + (C, N, colors.shape[-1])
            )
        else:
            colors_cn = colors
    else:
        campos = jnp.linalg.inv(viewmats)[..., :3, 3]  # [..., C, 3]
        dirs = means[..., None, :, :] - campos[..., :, None, :]  # [..., C, N, 3]
        masks = (radii > 0).all(axis=-1)
        if colors.ndim == num_batch_dims + 3:
            shs = jnp.broadcast_to(
                colors[..., None, :, :, :],
                batch_dims + (C, N) + colors.shape[-2:],
            )
        else:
            shs = colors
        colors_cn = spherical_harmonics(sh_degree, dirs, shs, masks=masks)
        # apples-to-apples with the Inria backend (reference rendering.py:525)
        colors_cn = jnp.maximum(colors_cn + 0.5, 0.0)

    D = colors_cn.shape[-1]

    # Depth channels per render mode (reference rendering.py:612-629).
    if render_mode in ("RGB+D", "RGB+ED"):
        colors_cn = jnp.concatenate([colors_cn, depths[..., None]], axis=-1)
        if backgrounds is not None:
            backgrounds = jnp.concatenate(
                [backgrounds, jnp.zeros(batch_dims + (C, 1), backgrounds.dtype)],
                axis=-1,
            )
    elif render_mode in ("D", "ED"):
        colors_cn = depths[..., None]
        if backgrounds is not None:
            backgrounds = jnp.zeros(batch_dims + (C, 1), backgrounds.dtype)
    D = colors_cn.shape[-1]  # depth channels included

    # Tile intersection + global (tile, depth) sort. Not differentiated:
    # the sort order and offsets are integer plumbing.
    tile_width = math.ceil(width / float(tile_size))
    tile_height = math.ceil(height / float(tile_size))

    if rasterizer in ("packed", "packed_inference"):
        # Fast path: packed single-key sort + streaming Pallas kernel.
        # "packed_inference" additionally skips the chunk-realignment pass
        # (unaligned-start kernel) — forward only, not differentiable.
        from tdgs.ops.rasterize_pallas_packed import (
            rasterize_to_pixels_packed,
            rasterize_to_pixels_packed_inference,
        )
        from tdgs.ops.tiling import isect_tiles_packed

        isect_p = isect_tiles_packed(
            jax.lax.stop_gradient(means2d),
            radii,
            jax.lax.stop_gradient(depths),
            tile_size,
            tile_width,
            tile_height,
            max_tiles_per_gauss=max_tiles_per_gauss,
            capacity=isect_capacity, exact=isect_exact,
            exact_depth=isect_exact_depth,
            split_k=isect_split_k, big_capacity=isect_big_capacity,
        )
        meta.update(
            {
                "tile_width": tile_width,
                "tile_height": tile_height,
                "isect_ids": isect_p.isect_keys,
                "flatten_ids": isect_p.flatten_ids,
                "isect_offsets": isect_p.offsets,
                "n_isects": isect_p.n_isects,
                "n_dropped": isect_p.n_dropped,
                "width": width,
                "height": height,
                "tile_size": tile_size,
                "n_batches": B,
                "n_cameras": C,
            }
        )
        raster_packed = (
            rasterize_to_pixels_packed_inference
            if rasterizer == "packed_inference"
            else rasterize_to_pixels_packed
        )
        extra = {}
        if means2d_abs_tap is not None:
            assert rasterizer == "packed", (
                "means2d_abs_tap requires a differentiable rasterizer"
            )
            extra["absgrad_dummy"] = means2d_abs_tap.reshape(I * N, 2)
        render_colors, render_alphas = raster_packed(
            means2d,
            conics,
            colors_cn,
            opacities_cn,
            width,
            height,
            tile_size,
            isect_p.offsets,
            isect_p.flatten_ids,
            backgrounds=backgrounds,
            tile_capacity=tile_capacity,
            **extra,
        )
        if render_mode in ("ED", "RGB+ED"):
            render_colors = jnp.concatenate(
                [
                    render_colors[..., :-1],
                    render_colors[..., -1:] / jnp.maximum(render_alphas, 1e-10),
                ],
                axis=-1,
            )
        return render_colors, render_alphas, meta

    if rasterizer == "eval3d_packed":
        # world-space rasterization on the streaming Pallas kernel —
        # differentiable fast path of the eval3d branch below (grads flow
        # to splat params and camera poses via the custom-VJP core)
        from tdgs.ops.camera_models import RollingShutterType
        from tdgs.ops.rasterize_eval3d_pallas import (
            rasterize_to_pixels_eval3d_packed,
        )
        from tdgs.ops.tiling import isect_tiles_packed

        assert not batch_dims, "eval3d supports unbatched [N] gaussians"
        assert quats is not None, "eval3d requires quats/scales (not covars)"
        assert means2d_abs_tap is None, "absgrad: use the 'packed'/'jax' path"
        isect_p = isect_tiles_packed(
            jax.lax.stop_gradient(means2d),
            radii,
            jax.lax.stop_gradient(depths),
            tile_size, tile_width, tile_height,
            max_tiles_per_gauss=max_tiles_per_gauss,
            capacity=isect_capacity, exact=isect_exact,
            exact_depth=isect_exact_depth,
            split_k=isect_split_k, big_capacity=isect_big_capacity,
        )
        meta.update(
            {
                "tile_width": tile_width,
                "tile_height": tile_height,
                "isect_ids": isect_p.isect_keys,
                "flatten_ids": isect_p.flatten_ids,
                "isect_offsets": isect_p.offsets,
                "n_isects": isect_p.n_isects,
                "n_dropped": isect_p.n_dropped,
                "width": width,
                "height": height,
                "tile_size": tile_size,
                "n_batches": B,
                "n_cameras": C,
            }
        )
        render_colors, render_alphas = (
            rasterize_to_pixels_eval3d_packed(
                means, quats, scales,
                colors_cn.reshape(I, N, D),
                opacities_cn.reshape(I, N),
                viewmats.reshape(I, 4, 4),
                Ks.reshape(I, 3, 3),
                width, height, tile_size,
                isect_p.offsets, isect_p.flatten_ids,
                camera_model=camera_model,
                radial_coeffs=radial_coeffs,
                tangential_coeffs=tangential_coeffs,
                thin_prism_coeffs=thin_prism_coeffs,
                ftheta_coeffs=ftheta_coeffs,
                backgrounds=(
                    backgrounds.reshape(I, -1)
                    if backgrounds is not None else None
                ),
                tile_capacity=tile_capacity,
                rolling_shutter=(
                    rolling_shutter if rolling_shutter is not None
                    else RollingShutterType.GLOBAL
                ),
                viewmats_rs=(
                    viewmats_rs.reshape(I, 4, 4)
                    if viewmats_rs is not None else None
                ),
            )
        )
        render_colors = render_colors.reshape(
            batch_dims + (C, height, width, D)
        )
        render_alphas = render_alphas.reshape(
            batch_dims + (C, height, width, 1)
        )
        if render_mode in ("ED", "RGB+ED"):
            render_colors = jnp.concatenate(
                [
                    render_colors[..., :-1],
                    render_colors[..., -1:]
                    / jnp.maximum(render_alphas, 1e-10),
                ],
                axis=-1,
            )
        return render_colors, render_alphas, meta

    if isect_capacity is None:
        isect_capacity = default_isect_capacity(I, N)

    isect = isect_tiles(
        jax.lax.stop_gradient(means2d),
        radii,
        jax.lax.stop_gradient(depths),
        tile_size,
        tile_width,
        tile_height,
        capacity=isect_capacity,
        max_tiles_per_gauss=max_tiles_per_gauss,
    )
    isect_offsets = isect_offset_encode(isect.isect_keys, I, tile_width, tile_height)

    meta.update(
        {
            "tile_width": tile_width,
            "tile_height": tile_height,
            "tiles_per_gauss": isect.tiles_per_gauss,
            "isect_ids": isect.isect_keys,
            "isect_depths": isect.isect_depths,
            "flatten_ids": isect.flatten_ids,
            "isect_offsets": isect_offsets.reshape(
                batch_dims + (C, tile_height, tile_width)
            ),
            "n_isects": isect.n_isects,
            "n_dropped": isect.n_dropped,
            "width": width,
            "height": height,
            "tile_size": tile_size,
            "n_batches": B,
            "n_cameras": C,
        }
    )

    if rasterizer == "eval3d":
        # world-space rasterization (3DGUT eval3d branch, reference
        # rendering.py:668-759): evaluate the true gaussian response along
        # each pixel's distorted camera ray; tile lists come from the
        # (possibly UT) projection above.
        from tdgs.ops.camera_models import RollingShutterType
        from tdgs.ops.rasterize_eval3d import rasterize_to_pixels_eval3d_jax

        assert not batch_dims, "eval3d supports unbatched [N] gaussians"
        assert quats is not None, "eval3d requires quats/scales (not covars)"
        assert means2d_abs_tap is None, "absgrad: use the 'packed'/'jax' path"
        render_colors, render_alphas = rasterize_to_pixels_eval3d_jax(
            means, quats, scales,
            colors_cn.reshape(I, N, D),
            opacities_cn.reshape(I, N),
            viewmats.reshape(I, 4, 4),
            Ks.reshape(I, 3, 3),
            width, height, tile_size,
            isect_offsets, isect.flatten_ids, isect.n_isects,
            camera_model=camera_model,
            radial_coeffs=radial_coeffs,
            tangential_coeffs=tangential_coeffs,
            thin_prism_coeffs=thin_prism_coeffs,
            ftheta_coeffs=ftheta_coeffs,
            backgrounds=(
                backgrounds.reshape(I, -1) if backgrounds is not None else None
            ),
            tile_capacity=tile_capacity,
            rolling_shutter=(
                rolling_shutter if rolling_shutter is not None
                else RollingShutterType.GLOBAL
            ),
            viewmats_rs=(
                viewmats_rs.reshape(I, 4, 4)
                if viewmats_rs is not None else None
            ),
        )
        render_colors = render_colors.reshape(
            batch_dims + (C, height, width, D)
        )
        render_alphas = render_alphas.reshape(
            batch_dims + (C, height, width, 1)
        )
        if render_mode in ("ED", "RGB+ED"):
            render_colors = jnp.concatenate(
                [
                    render_colors[..., :-1],
                    render_colors[..., -1:]
                    / jnp.maximum(render_alphas, 1e-10),
                ],
                axis=-1,
            )
        return render_colors, render_alphas, meta

    if rasterizer == "jax":
        rasterize_fn = rasterize_to_pixels_jax
    elif rasterizer == "pallas":
        from tdgs.ops.rasterize_pallas import rasterize_to_pixels_pallas

        rasterize_fn = rasterize_to_pixels_pallas
    else:
        raise ValueError(f"unknown rasterizer {rasterizer!r}")

    extra = {}
    if means2d_abs_tap is not None:
        assert rasterizer == "jax", (
            "means2d_abs_tap is supported by the 'jax' and 'packed' "
            "rasterizers only"
        )
        extra["absgrad_dummy"] = means2d_abs_tap.reshape(I * N, 2)
    render_colors, render_alphas = rasterize_fn(
        means2d,
        conics,
        colors_cn,
        opacities_cn,
        width,
        height,
        tile_size,
        isect_offsets,
        isect.flatten_ids,
        isect.n_isects,
        backgrounds=backgrounds,
        tile_capacity=tile_capacity,
        **extra,
    )

    if render_mode in ("ED", "RGB+ED"):
        render_colors = jnp.concatenate(
            [
                render_colors[..., :-1],
                render_colors[..., -1:] / jnp.maximum(render_alphas, 1e-10),
            ],
            axis=-1,
        )

    return render_colors, render_alphas, meta


def rasterization_2dgs(
    means: jnp.ndarray,  # [..., N, 3]
    quats: jnp.ndarray,  # [..., N, 4]
    scales: jnp.ndarray,  # [..., N, 3] (z unused)
    opacities: jnp.ndarray,  # [..., N]
    colors: jnp.ndarray,  # [..., (C,) N, D] or [..., (C,) N, K, 3]
    viewmats: jnp.ndarray,  # [..., C, 4, 4]
    Ks: jnp.ndarray,  # [..., C, 3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    sh_degree: Optional[int] = None,
    tile_size: int = 16,
    backgrounds: Optional[jnp.ndarray] = None,
    render_mode: str = "RGB",
    distloss: bool = False,
    depth_mode: str = "expected",
    isect_capacity: Optional[int] = None,
    tile_capacity: int = 512,
    max_tiles_per_gauss: int = 32,
    isect_exact: bool = False,
    isect_exact_depth: bool = False,
    isect_split_k: Optional[int] = None,
    isect_big_capacity: Optional[int] = None,
    rasterizer: str = "jax",
    means2d_offset: Optional[jnp.ndarray] = None,  # [..., C, N, 2]
    means2d_abs_tap: Optional[jnp.ndarray] = None,  # [..., C, N, 2]
    # --- reference drop-in kwargs (gsplat/rendering.py:1270 argument set) ---
    eps2d: float = 0.3,
    packed: Optional[bool] = None,
    sparse_grad: bool = False,
    absgrad: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Rasterize 2D (surfel) Gaussians — API parity with the reference's
    ``rasterization_2dgs`` (gsplat/rendering.py:1270): returns
    (render_colors, render_alphas, render_normals [world frame],
    render_normals_from_depth, render_distort, render_median, meta).

    ``rasterizer``: "jax" (differentiable jnp oracle, full outputs),
    "packed" (differentiable streaming Pallas training path, full outputs;
    median depth is non-differentiable), or "packed_inference" (fastest
    forward-only path; distortion/median outputs are zeros).

    Reference drop-in kwargs: ``packed``/``sparse_grad`` (CUDA COO layouts;
    dense masked here) are accepted and ignored. ``eps2d`` is accepted for
    signature parity — the reference's own 2DGS CUDA projection never reads
    it (Projection2DGSFused.cu takes no eps2d; only the wrapper signature
    carries it), so it is ignored here too. ``absgrad`` (AbsGS, reference
    rendering.py:1290 → RasterizeToPixels2DGSBwd.cu v_means2d_abs) becomes
    the explicit ``means2d_abs_tap`` exactly as in :func:`rasterization`:
    pass zeros [..., C, N, 2]; the gradient of the loss w.r.t. it is the
    per-gaussian accumulation of |per-tile screen gradients|. Supported by
    the "jax" and "packed" rasterizers."""
    if absgrad and means2d_abs_tap is None:
        raise ValueError(
            "absgrad: JAX has no tensor.grad side channel — pass "
            "means2d_abs_tap=jnp.zeros(batch + (C, N, 2)) and take the "
            "gradient of the loss w.r.t. that input (the trainer's "
            "DefaultStrategy absgrad path shows the pattern)."
        )
    del packed, sparse_grad, eps2d, absgrad
    from tdgs.ops.projection_2dgs import fully_fused_projection_2dgs
    from tdgs.ops.rasterize_2dgs_jax import rasterize_to_pixels_2dgs_jax
    from tdgs.utils.depth import depth_to_normal

    meta: Dict = {}
    batch_dims = means.shape[:-2]
    num_batch_dims = len(batch_dims)
    B = math.prod(batch_dims) if batch_dims else 1
    N = means.shape[-2]
    C = viewmats.shape[-3]
    I = B * C
    assert render_mode in RENDER_MODES, render_mode

    radii, means2d, depths, ray_transforms, normals = fully_fused_projection_2dgs(
        means, quats, scales, viewmats, Ks, width, height,
        near_plane=near_plane, far_plane=far_plane, radius_clip=radius_clip,
    )
    if means2d_offset is not None:
        # densification tap (same contract as the 3DGS path): the gradient
        # of the loss w.r.t. this zeros input is the screen-space means2d
        # gradient DefaultStrategy densifies on
        assert means2d_offset.shape == means2d.shape, (
            means2d_offset.shape, means2d.shape,
        )
        means2d = means2d + means2d_offset
    opacities_cn = jnp.broadcast_to(opacities[..., None, :], batch_dims + (C, N))

    if sh_degree is None:
        if colors.ndim == num_batch_dims + 2:
            colors_cn = jnp.broadcast_to(
                colors[..., None, :, :], batch_dims + (C, N, colors.shape[-1])
            )
        else:
            colors_cn = colors
    else:
        campos = jnp.linalg.inv(viewmats)[..., :3, 3]
        dirs = means[..., None, :, :] - campos[..., :, None, :]
        masks = (radii > 0).all(axis=-1)
        if colors.ndim == num_batch_dims + 3:
            shs = jnp.broadcast_to(
                colors[..., None, :, :, :], batch_dims + (C, N) + colors.shape[-2:]
            )
        else:
            shs = colors
        colors_cn = spherical_harmonics(sh_degree, dirs, shs, masks=masks)
        colors_cn = jnp.maximum(colors_cn + 0.5, 0.0)

    # depth channel appended when needed (also feeds distortion/median)
    need_depth = distloss or render_mode in ("D", "ED", "RGB+D", "RGB+ED")
    if render_mode in ("D", "ED"):
        colors_cn = depths[..., None]
    elif need_depth:
        colors_cn = jnp.concatenate([colors_cn, depths[..., None]], axis=-1)
    if backgrounds is not None and need_depth and render_mode not in ("D", "ED"):
        backgrounds = jnp.concatenate(
            [backgrounds, jnp.zeros(batch_dims + (C, 1), backgrounds.dtype)],
            axis=-1,
        )
    elif backgrounds is not None and render_mode in ("D", "ED"):
        backgrounds = jnp.zeros(batch_dims + (C, 1), backgrounds.dtype)

    tile_width = math.ceil(width / float(tile_size))
    tile_height = math.ceil(height / float(tile_size))
    if rasterizer in ("packed", "packed_inference"):
        # streaming Pallas fast paths: "packed" is the differentiable
        # training kernel pair (unaligned stream, custom VJP, real
        # distortion/median outputs); "packed_inference" is forward-only
        # with zero distort/median.
        from tdgs.ops.rasterize_2dgs_pallas import (
            rasterize_to_pixels_2dgs_packed,
            rasterize_to_pixels_2dgs_packed_inference,
        )
        from tdgs.ops.tiling import isect_tiles_packed

        isect_p = isect_tiles_packed(
            jax.lax.stop_gradient(means2d), radii,
            jax.lax.stop_gradient(depths), tile_size, tile_width,
            tile_height, max_tiles_per_gauss=max_tiles_per_gauss,
            capacity=isect_capacity, exact=isect_exact,
            exact_depth=isect_exact_depth,
            split_k=isect_split_k, big_capacity=isect_big_capacity,
        )
        if rasterizer == "packed":
            extra = {}
            if means2d_abs_tap is not None:
                extra["absgrad_dummy"] = means2d_abs_tap.reshape(I * N, 2)
            (render_colors, render_alphas, render_normals_cam,
             render_distort, render_median) = rasterize_to_pixels_2dgs_packed(
                means2d, ray_transforms, colors_cn, normals, opacities_cn,
                width, height, tile_size, isect_p.offsets,
                isect_p.flatten_ids, backgrounds=backgrounds,
                tile_capacity=tile_capacity,
                has_depth=need_depth,
                compute_distort=distloss or need_depth,
                **extra,
            )
        else:
            assert means2d_abs_tap is None, (
                "means2d_abs_tap requires a differentiable rasterizer"
            )
            render_colors, render_alphas, render_normals_cam = (
                rasterize_to_pixels_2dgs_packed_inference(
                    means2d, ray_transforms, colors_cn, normals,
                    opacities_cn, width, height, tile_size, isect_p.offsets,
                    isect_p.flatten_ids, backgrounds=backgrounds,
                    tile_capacity=tile_capacity,
                )
            )
            render_distort = jnp.zeros_like(render_alphas)
            render_median = jnp.zeros_like(render_alphas)

        class _IsectShim:
            tiles_per_gauss = None
            isect_keys = isect_p.isect_keys
            flatten_ids = isect_p.flatten_ids
            n_isects = isect_p.n_isects
            n_dropped = isect_p.n_dropped

        isect = _IsectShim()
        isect_offsets = jnp.zeros((I, tile_height, tile_width), jnp.int32)
    else:
        if isect_capacity is None:
            isect_capacity = default_isect_capacity(I, N)
        isect = isect_tiles(
            jax.lax.stop_gradient(means2d), radii,
            jax.lax.stop_gradient(depths),
            tile_size, tile_width, tile_height,
            capacity=isect_capacity, max_tiles_per_gauss=max_tiles_per_gauss,
        )
        isect_offsets = isect_offset_encode(
            isect.isect_keys, I, tile_width, tile_height
        )

        extra = {}
        if means2d_abs_tap is not None:
            extra["absgrad_dummy"] = means2d_abs_tap.reshape(I * N, 2)
        (render_colors, render_alphas, render_normals_cam, render_distort,
         render_median) = rasterize_to_pixels_2dgs_jax(
            means2d, ray_transforms, colors_cn, normals, opacities_cn,
            width, height, tile_size, isect_offsets, isect.flatten_ids,
            isect.n_isects, backgrounds=backgrounds,
            tile_capacity=tile_capacity,
            compute_distort=distloss or need_depth,
            **extra,
        )

    if render_mode in ("ED", "RGB+ED"):
        render_colors = jnp.concatenate(
            [
                render_colors[..., :-1],
                render_colors[..., -1:] / jnp.maximum(render_alphas, 1e-10),
            ],
            axis=-1,
        )

    render_normals_from_depth = None
    if render_mode in ("RGB+ED", "RGB+D"):
        depth_for_normal = (
            render_colors[..., -1:] if depth_mode == "expected" else render_median
        )
        render_normals_from_depth = depth_to_normal(
            depth_for_normal, jnp.linalg.inv(viewmats), Ks
        )

    meta.update(
        {
            "radii": radii,
            "means2d": means2d,
            "depths": depths,
            "ray_transforms": ray_transforms,
            "opacities": opacities_cn,
            "normals": normals,
            "tile_width": tile_width,
            "tile_height": tile_height,
            "tiles_per_gauss": isect.tiles_per_gauss,
            "isect_ids": isect.isect_keys,
            "flatten_ids": isect.flatten_ids,
            "isect_offsets": isect_offsets.reshape(
                batch_dims + (C, tile_height, tile_width)
            ),
            "n_isects": isect.n_isects,
            "n_dropped": isect.n_dropped,
            "width": width,
            "height": height,
            "tile_size": tile_size,
            "n_cameras": C,
            "render_distort": render_distort,
        }
    )

    # normals to world frame (reference rendering.py:1615-1617)
    render_normals = jnp.einsum(
        "...ij,...hwj->...hwi",
        jnp.linalg.inv(viewmats)[..., :3, :3],
        render_normals_cam,
        precision="highest",
    )

    return (
        render_colors,
        render_alphas,
        render_normals,
        render_normals_from_depth,
        render_distort,
        render_median,
        meta,
    )


def rasterization_inria_wrapper(
    means, quats, scales, opacities, colors, viewmats, Ks,
    width: int, height: int,
    near_plane: float = 0.01, far_plane: float = 100.0,
    eps2d: float = 0.3, sh_degree=None, backgrounds=None, **kwargs,
):
    """API-compatible stand-in for the reference's Inria-backend wrapper
    (gsplat/rendering.py:rasterization_inria_wrapper:1108). The Inria
    diff-gaussian-rasterization CUDA backend does not exist on TPU, so this
    preserves the calling convention (eps2d fixed at 0.3, Inria's SH color
    offset) while routing through the native rasterizer."""
    assert eps2d == 0.3, "Inria's backend hard-codes eps2d=0.3"
    return rasterization(
        means, quats, scales, opacities, colors, viewmats, Ks,
        width, height,
        near_plane=near_plane, far_plane=far_plane, eps2d=eps2d,
        sh_degree=sh_degree, backgrounds=backgrounds, **kwargs,
    )


def rasterization_2dgs_inria_wrapper(
    means, quats, scales, opacities, colors, viewmats, Ks,
    width: int, height: int,
    near_plane: float = 0.01, far_plane: float = 100.0,
    sh_degree=None, backgrounds=None, **kwargs,
):
    """2DGS counterpart of rasterization_inria_wrapper (reference
    rendering.py:1630, wrapping hbb1/diff-surfel-rasterization): same
    surfel outputs through the native path."""
    return rasterization_2dgs(
        means, quats, scales, opacities, colors, viewmats, Ks,
        width, height,
        near_plane=near_plane, far_plane=far_plane,
        sh_degree=sh_degree, backgrounds=backgrounds, **kwargs,
    )
