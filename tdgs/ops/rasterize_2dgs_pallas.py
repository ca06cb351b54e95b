"""Packed-stream Pallas 2DGS rasterizer (inference fast path).

TPU counterpart of the reference's RasterizeToPixels2DGSFwd.cu on the same
streaming skeleton as the 3DGS production kernel
(tdgs.ops.rasterize_pallas_packed): sorted intersection entries are read
with unaligned 128-lane windows through a 3-slot DMA pipeline, the
ray-splat response is evaluated on the VPU, and compositing runs as the
triangular-matmul log-space prefix product on the MXU.

Per-entry features on sublanes: mx, my, the 9 entries of the ray-transform
matrix M (row-major), opacity, then the accumulation channels (colors
[+depth] and the 3 camera-frame normal components — normals composite
exactly like colors, so they ride the same matmul).

Two entry points: rasterize_to_pixels_2dgs_packed_inference (forward-only,
no distortion/median outputs) and rasterize_to_pixels_2dgs_packed (the
differentiable training path — TPU counterpart of
RasterizeToPixels2DGSFwd.cu + Bwd.cu:861 with distortion/median-depth,
Fwd.cu:389-438, on the cross-tile carry-chunk write protocol described in
rasterize_pallas_packed).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tdgs.ops.projection import ALPHA_THRESHOLD
from tdgs.ops.rasterize_jax import ALPHA_CLAMP, TRANSMITTANCE_EPS
from tdgs.ops.rasterize_pallas_packed import (
    CHUNK,
    _dot_bf16x3,
    _exp_fast,
    _log1p_neg_fast,
    _pixel_coords,
    _pixel_moment_basis,
    _tri_upper_incl,
    _use_interpret,
)


def _chunk_values_2dgs(buf, px, py, DA: int, poly="global"):
    """Per-chunk α and accumulation channels from a [F, CHUNK] block.

    buf rows: 0 mx, 1 my, 2..10 the three precomputed cross products
    (t0 = M0×M1, tpx = M1×M2, tpy = M2×M0; see the wrapper), 11 op,
    12..12+DA channels. Returns (alpha [P, G], channels [DA, G]).

    The ray-splat intersection cross(h_u, h_v) with h_u = M2·px − M0 and
    h_v = M2·py − M1 is bilinear in (px, py) with a vanishing px·py term
    (M2×M2 = 0), so tmp = t0 + tpx·px + tpy·py — the per-entry cross
    products move to the XLA side and the kernel does 2 FMAs/component."""
    mx = buf[0:1, :]
    my = buf[1:2, :]
    t0 = [buf[2 + i : 3 + i, :] for i in range(3)]  # [1, G] each
    tpx = [buf[5 + i : 6 + i, :] for i in range(3)]
    tpy = [buf[8 + i : 9 + i, :] for i in range(3)]
    op = buf[11:12, :]
    ch = buf[12 : 12 + DA, :]

    tmpx = t0[0] + tpx[0] * px + tpy[0] * py  # [P, G]
    tmpy = t0[1] + tpx[1] * px + tpy[1] * py
    tmpz = t0[2] + tpx[2] * px + tpy[2] * py
    bad = jnp.abs(tmpz) < 1e-9
    rtz = 1.0 / jnp.where(bad, 1.0, tmpz)  # one reciprocal, no divides
    sigma3d = jnp.where(
        bad, 1e6, (tmpx * tmpx + tmpy * tmpy) * (rtz * rtz)
    )
    dx = mx - px
    dy = my - py
    sigma2d = 2.0 * (dx * dx + dy * dy)
    sigma = 0.5 * jnp.minimum(sigma3d, sigma2d)
    alpha = jnp.minimum(ALPHA_CLAMP, op * _exp_fast(-sigma, poly))
    alpha = jnp.where(alpha < ALPHA_THRESHOLD, 0.0, alpha)
    return alpha, ch


def _fwd_kernel_2dgs_unaligned(
    offs_ref, packed_ref, color_out_ref, trans_out_ref, buf, sems,
    acc_ref, lograw_ref, logeff_ref, *,
    tile_size: int, tile_width: int, tiles_per_image: int,
    max_chunks: int, DA: int,
):
    """Identical streaming structure to the 3DGS unaligned kernel
    (rasterize_pallas_packed._fwd_kernel_unaligned) with the 2DGS
    ray-splat response. See that kernel for the DMA-pipeline invariants
    (prefetch k+2 / wait k+1, whole-window zeroing before use)."""
    t = pl.program_id(0)
    px, py = _pixel_coords(tile_size, tile_width, tiles_per_image, t)
    tri = _tri_upper_incl(CHUNK)

    start = offs_ref[t]
    end = offs_ref[t + 1]
    count = jnp.minimum(end - start, max_chunks * CHUNK)
    astart = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    s0 = start - astart
    n = pl.cdiv(count, CHUNK)
    span = pl.cdiv(s0 + count, CHUNK)

    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    lograw_ref[:, :] = jnp.zeros_like(lograw_ref)
    logeff_ref[:, :] = jnp.zeros_like(logeff_ref)

    def dma(j):
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(astart + j * CHUNK, CHUNK)],
            buf.at[j % 3],
            sems.at[j % 3],
        )

    @pl.when(span > 0)
    def _():
        dma(0).start()

    @pl.when(span > 1)
    def _():
        dma(1).start()

    @pl.when(span > 0)
    def _():
        dma(0).wait()

    def body(k, _):
        @pl.when(k + 2 < span)
        def _():
            dma(k + 2).start()

        @pl.when(k + 1 < span)
        def _():
            dma(k + 1).wait()

        combined = jnp.concatenate([buf[k % 3], buf[(k + 1) % 3]], axis=1)
        window = pltpu.roll(combined, -s0, 1)[:, :CHUNK]
        in_range = (
            jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + k * CHUNK
            < count
        )
        # zero ALL features of out-of-range lanes BEFORE any use
        window = jnp.where(in_range, window, 0.0)

        not_done = jnp.max(lograw_ref[:, 0:1]) > jnp.log(TRANSMITTANCE_EPS)

        @pl.when(not_done)
        def _():
            alpha, channels = _chunk_values_2dgs(window, px, py, DA)
            alpha = jnp.where(in_range, alpha, 0.0)
            logs = _log1p_neg_fast(alpha)
            S = jnp.dot(logs, tri, preferred_element_type=jnp.float32)
            logP = S + lograw_ref[:, 0:1]
            included = logP > jnp.log(TRANSMITTANCE_EPS)
            P_prev = _exp_fast(logP - logs)
            w = jnp.where(included, alpha * P_prev, 0.0)
            acc_ref[:, :] += jax.lax.dot_general(
                channels, w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            lograw_ref[:, :] += jnp.sum(logs, axis=1, keepdims=True)
            # [1, P] lane-major accumulator via MXU ones-contraction (see
            # the 3DGS kernel's logeff)
            logeff_ref[:, :] += jax.lax.dot_general(
                jnp.ones((1, CHUNK), jnp.float32),
                jnp.where(included, logs, 0.0),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        return ()

    jax.lax.fori_loop(0, n, body, ())

    color_out_ref[:, :] = acc_ref[:, :]
    trans_out_ref[:, :] = _exp_fast(logeff_ref[:, :])


def rasterize_to_pixels_2dgs_packed_inference(
    means2d: jnp.ndarray,  # [..., N, 2]
    ray_transforms: jnp.ndarray,  # [..., N, 3, 3]
    colors: jnp.ndarray,  # [..., N, D]
    normals: jnp.ndarray,  # [..., N, 3]
    opacities: jnp.ndarray,  # [..., N]
    image_width: int,
    image_height: int,
    tile_size: int,
    offsets: jnp.ndarray,  # [T+1] int32 UNALIGNED (isect_tiles_packed)
    flatten_ids: jnp.ndarray,  # [capacity]
    backgrounds: Optional[jnp.ndarray] = None,
    tile_capacity: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward-only packed 2DGS rasterization. Returns
    (render_colors [..., H, W, D], render_alphas [..., H, W, 1],
    render_normals_cam [..., H, W, 3]). NOT differentiable."""
    image_dims = means2d.shape[:-2]
    N = means2d.shape[-2]
    D = colors.shape[-1]
    DA = D + 3  # colors (+depth) plus camera-frame normals
    I = math.prod(image_dims) if image_dims else 1
    tile_width = math.ceil(image_width / tile_size)
    tile_height = math.ceil(image_height / tile_size)
    T_total = I * tile_width * tile_height
    P = tile_size * tile_size

    F_pad = -(-(12 + DA) // 8) * 8
    # precompute the bilinear-expansion cross products (see kernel docstring)
    M_f = ray_transforms.reshape(I * N, 3, 3)
    t0 = jnp.cross(M_f[:, 0], M_f[:, 1])
    tpx = jnp.cross(M_f[:, 1], M_f[:, 2])
    tpy = jnp.cross(M_f[:, 2], M_f[:, 0])
    feats = jnp.concatenate(
        [
            means2d.reshape(I * N, 2),
            t0, tpx, tpy,
            opacities.reshape(I * N, 1),
            colors.reshape(I * N, D),
            normals.reshape(I * N, 3),
            jnp.zeros((I * N, F_pad - 12 - DA), means2d.dtype),
        ],
        axis=-1,
    )
    capacity = flatten_ids.shape[0]
    pad = (-capacity) % CHUNK + CHUNK  # slack so the last window DMA fits
    flatten_ids = jnp.pad(flatten_ids, (0, pad))
    feats = jax.lax.optimization_barrier(feats)
    packed = jax.lax.optimization_barrier(feats[flatten_ids]).T

    kern = functools.partial(
        _fwd_kernel_2dgs_unaligned,
        tile_size=tile_size,
        tile_width=tile_width,
        tiles_per_image=tile_width * tile_height,
        max_chunks=max(tile_capacity // CHUNK, 1),
        DA=DA,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_total,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((None, DA, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, F_pad, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((DA, P), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),  # lograw
            pltpu.VMEM((1, P), jnp.float32),  # logeff (lane-major)
        ],
    )
    acc_out, trans_out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_total, DA, P), jnp.float32),
            jax.ShapeDtypeStruct((T_total, 1, P), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret(),
    )(offsets, packed)

    pad_h, pad_w = tile_height * tile_size, tile_width * tile_size
    img = acc_out.reshape(I, tile_height, tile_width, DA, tile_size, tile_size)
    img = img.transpose(0, 1, 4, 2, 5, 3).reshape(I, pad_h, pad_w, DA)
    alp = 1.0 - trans_out.reshape(I, tile_height, tile_width, tile_size, tile_size)
    alp = alp.transpose(0, 1, 3, 2, 4).reshape(I, pad_h, pad_w)
    img = img[:, :image_height, :image_width, :]
    alp = alp[:, :image_height, :image_width]

    colors_img = img[..., :D]
    normals_img = img[..., D:]
    if backgrounds is not None:
        colors_img = colors_img + (1.0 - alp[..., None]) * backgrounds.reshape(
            I, 1, 1, D
        )
    shp = image_dims + (image_height, image_width)
    return (
        colors_img.reshape(shp + (D,)),
        alp.reshape(shp + (1,)),
        normals_img.reshape(shp + (3,)),
    )


# ---------------------------------------------------------------------------
# Differentiable training path: aligned entry ranges, custom-VJP Pallas pair
# (TPU counterpart of RasterizeToPixels2DGSFwd.cu + Bwd.cu:861; gradient set
# means2d, ray_transforms (via the t0/tpx/tpy cross products), colors,
# opacities, normals, plus the distortion loss's depth/weight gradients)
# ---------------------------------------------------------------------------


def _tri_strict_upper(g: int) -> jnp.ndarray:
    """M[j, k] = 1 iff j < k: x @ M is an EXCLUSIVE cumsum along lanes."""
    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (row < col).astype(jnp.float32)


def _chunk_values_2dgs_full(buf, px, py, DA: int):
    """_chunk_values_2dgs plus the intermediates the backward pass needs."""
    mx = buf[0:1, :]
    my = buf[1:2, :]
    t0 = [buf[2 + i : 3 + i, :] for i in range(3)]
    tpx = [buf[5 + i : 6 + i, :] for i in range(3)]
    tpy = [buf[8 + i : 9 + i, :] for i in range(3)]
    op = buf[11:12, :]
    ch = buf[12 : 12 + DA, :]

    tmpx = t0[0] + tpx[0] * px + tpy[0] * py
    tmpy = t0[1] + tpx[1] * px + tpy[1] * py
    tmpz = t0[2] + tpx[2] * px + tpy[2] * py
    bad = jnp.abs(tmpz) < 1e-9
    rtz = 1.0 / jnp.where(bad, 1.0, tmpz)
    sigma3d = jnp.where(bad, 1e6, (tmpx * tmpx + tmpy * tmpy) * (rtz * rtz))
    dx = mx - px
    dy = my - py
    sigma2d = 2.0 * (dx * dx + dy * dy)
    sigma = 0.5 * jnp.minimum(sigma3d, sigma2d)
    vis = _exp_fast(-sigma, poly=False)
    alpha = jnp.minimum(ALPHA_CLAMP, op * vis)
    alpha = jnp.where(alpha < ALPHA_THRESHOLD, 0.0, alpha)
    use3d = (sigma3d <= sigma2d) & ~bad
    return alpha, ch, (tmpx, tmpy, rtz, sigma3d, dx, dy, use3d, vis, op)


def rasterize_to_pixels_2dgs_packed(
    means2d: jnp.ndarray,  # [..., N, 2]
    ray_transforms: jnp.ndarray,  # [..., N, 3, 3]
    colors: jnp.ndarray,  # [..., N, D] (last channel depth when present)
    normals: jnp.ndarray,  # [..., N, 3]
    opacities: jnp.ndarray,  # [..., N]
    image_width: int,
    image_height: int,
    tile_size: int,
    offsets: jnp.ndarray,  # [T+1] int32 (from isect_tiles_packed)
    flatten_ids: jnp.ndarray,  # [capacity]
    backgrounds: Optional[jnp.ndarray] = None,
    tile_capacity: int = 1024,
    has_depth: bool = False,
    compute_distort: bool = False,
    absgrad_dummy: Optional[jnp.ndarray] = None,  # [I*N, 2] zeros
) -> Tuple[jnp.ndarray, ...]:
    """Differentiable packed-stream 2DGS rasterization (training fast path).

    Returns (render_colors [..., H, W, D], render_alphas [..., H, W, 1],
    render_normals_cam [..., H, W, 3], render_distort [..., H, W, 1],
    render_median [..., H, W, 1]) — the contract of
    rasterize_to_pixels_2dgs_jax. Median depth is a non-differentiable
    output. Gradients flow to means2d, ray_transforms, colors, normals,
    opacities (reference RasterizeToPixels2DGSBwd.cu:861's gradient set).
    """
    image_dims = means2d.shape[:-2]
    N = means2d.shape[-2]
    D = colors.shape[-1]
    DA = D + 3
    depth_row = (D - 1) if has_depth else -1
    I = math.prod(image_dims) if image_dims else 1
    tile_width = math.ceil(image_width / tile_size)
    tile_height = math.ceil(image_height / tile_size)
    T_total = I * tile_width * tile_height

    F_pad = -(-(12 + DA) // 8) * 8
    M_f = ray_transforms.reshape(I * N, 3, 3)
    t0 = jnp.cross(M_f[:, 0], M_f[:, 1])
    tpx = jnp.cross(M_f[:, 1], M_f[:, 2])
    tpy = jnp.cross(M_f[:, 2], M_f[:, 0])
    feats = jnp.concatenate(
        [
            means2d.reshape(I * N, 2),
            t0, tpx, tpy,
            opacities.reshape(I * N, 1),
            colors.reshape(I * N, D),
            normals.reshape(I * N, 3),
            jnp.zeros((I * N, F_pad - 12 - DA), means2d.dtype),
        ],
        axis=-1,
    )
    # UNALIGNED stream — no realignment pass (see the 3DGS wrapper's note:
    # the aligned re-layout cost +CHUNK·T stream entries)
    capacity = flatten_ids.shape[0]
    pad = (-capacity) % CHUNK + CHUNK  # slack so the last window DMA fits
    ids = jnp.pad(flatten_ids, (0, pad))
    capacity += pad
    entry_valid = jnp.arange(capacity, dtype=jnp.int32) < offsets[-1]
    ids = jnp.where(entry_valid, ids, 0)
    # The gather's VJP is the payload-sort + streaming segment-sum route
    # (tdgs/ops/segment_sum_pallas.py), not XLA's scatter-add; all 12+DA
    # real columns carry gradients (normals included), only the F_pad
    # tail is structurally zero.
    from tdgs.ops.segment_sum_pallas import gather_rows_segsum

    feats = jax.lax.optimization_barrier(feats)
    rows = gather_rows_segsum(feats, ids, 12 + DA)
    if absgrad_dummy is not None:
        # AbsGS tap (reference RasterizeToPixels2DGSBwd.cu v_means2d_abs):
        # rows' first two columns are the projected means, same layout as
        # the 3DGS packed wrapper's tap
        from tdgs.ops.rasterize_jax import absgrad_tap

        rows = absgrad_tap(rows, absgrad_dummy, ids, entry_valid)
    packed = jax.lax.optimization_barrier(rows).T
    # zero padding slots' opacity AFTER the transpose (single-row update)
    packed = packed.at[11:12, :].multiply(
        entry_valid[None, :].astype(packed.dtype)
    )

    acc_out, trans_out, dist_out, med_out = _raster_2dgs_unaligned_core(
        packed, offsets, tile_size, tile_width, tile_width * tile_height,
        T_total, max(tile_capacity // CHUNK, 1), DA, depth_row,
        compute_distort and has_depth,
    )

    pad_h, pad_w = tile_height * tile_size, tile_width * tile_size

    def untile(x, ch):
        img = x.reshape(I, tile_height, tile_width, ch, tile_size, tile_size)
        img = img.transpose(0, 1, 4, 2, 5, 3).reshape(I, pad_h, pad_w, ch)
        return img[:, :image_height, :image_width]

    img_all = untile(acc_out, DA)
    alp = 1.0 - untile(trans_out, 1)[..., 0]  # [T, 1, P] lane-major
    dst = untile(dist_out, 1)
    med = untile(med_out.swapaxes(1, 2), 1)

    colors_img = img_all[..., :D]
    normals_img = img_all[..., D:]
    if backgrounds is not None:
        colors_img = colors_img + (1.0 - alp[..., None]) * backgrounds.reshape(
            I, 1, 1, D
        )
    shp = image_dims + (image_height, image_width)
    return (
        colors_img.reshape(shp + (D,)),
        alp.reshape(shp + (1,)),
        normals_img.reshape(shp + (3,)),
        dst.reshape(shp + (1,)),
        med.reshape(shp + (1,)),
    )


# ---------------------------------------------------------------------------
# Differentiable UNALIGNED 2DGS path: training without the realignment pass
# (same cross-tile carry-chunk protocol as the 3DGS kernel — see the long
# comment in rasterize_pallas_packed above _bwd_kernel_unaligned)
# ---------------------------------------------------------------------------


def _fwd_kernel_2dgs_train(
    offs_ref,  # scalar prefetch [T+1] UNALIGNED offsets
    packed_ref, color_out_ref, trans_out_ref, dist_out_ref, med_out_ref,
    buf, sems, acc_ref, lograw_ref, logeff_ref, aprev_ref, bprev_ref,
    dist_ref, med_ref, *,
    tile_size: int, tile_width: int, tiles_per_image: int,
    max_chunks: int, DA: int, depth_row: int, compute_distort: bool,
):
    """Training forward: _fwd_kernel_2dgs_unaligned's 3-slot rolled-window
    read plus the aligned kernel's distortion / median-depth accumulators."""
    t = pl.program_id(0)
    px, py = _pixel_coords(tile_size, tile_width, tiles_per_image, t)
    tri = _tri_upper_incl(CHUNK)
    tri_x = _tri_strict_upper(CHUNK)
    lanes = jax.lax.broadcasted_iota(
        jnp.int32, (tile_size * tile_size, CHUNK), 1
    )

    start = offs_ref[t]
    end = offs_ref[t + 1]
    count = jnp.minimum(end - start, max_chunks * CHUNK)
    astart = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    s0 = start - astart
    n = pl.cdiv(count, CHUNK)
    span = pl.cdiv(s0 + count, CHUNK)

    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    lograw_ref[:, :] = jnp.zeros_like(lograw_ref)
    logeff_ref[:, :] = jnp.zeros_like(logeff_ref)
    aprev_ref[:, :] = jnp.zeros_like(aprev_ref)
    bprev_ref[:, :] = jnp.zeros_like(bprev_ref)
    dist_ref[:, :] = jnp.zeros_like(dist_ref)
    med_ref[:, :] = jnp.zeros_like(med_ref)

    def dma(j):
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(astart + j * CHUNK, CHUNK)],
            buf.at[j % 3],
            sems.at[j % 3],
        )

    @pl.when(span > 0)
    def _():
        dma(0).start()

    @pl.when(span > 1)
    def _():
        dma(1).start()

    @pl.when(span > 0)
    def _():
        dma(0).wait()

    def body(k, _):
        @pl.when(k + 2 < span)
        def _():
            dma(k + 2).start()

        @pl.when(k + 1 < span)
        def _():
            dma(k + 1).wait()

        combined = jnp.concatenate([buf[k % 3], buf[(k + 1) % 3]], axis=1)
        window = pltpu.roll(combined, -s0, 1)[:, :CHUNK]
        in_range = lanes[0:1, :] + k * CHUNK < count
        window = jnp.where(in_range, window, 0.0)

        not_done = jnp.max(lograw_ref[:, 0:1]) > jnp.log(TRANSMITTANCE_EPS)

        @pl.when(not_done)
        def _():
            # poly=True (forced): the round-4 A/B measured the polynomial
            # transcendentals a ~6% win in THIS kernel only (the distortion
            # /median accumulators keep the VPU port busy enough to expose
            # HW-transcendental latency) and a loss everywhere else — see
            # BENCH_BREAKDOWN_r04.md
            alpha, ch = _chunk_values_2dgs(window, px, py, DA, poly=True)
            alpha = jnp.where(in_range, alpha, 0.0)
            logs = _log1p_neg_fast(alpha, poly=True)
            S = jnp.dot(logs, tri, preferred_element_type=jnp.float32)
            logP = S + lograw_ref[:, 0:1]
            included = logP > jnp.log(TRANSMITTANCE_EPS)
            P_prev = _exp_fast(logP - logs, poly=True)
            w = jnp.where(included, alpha * P_prev, 0.0)
            acc_ref[:, :] += jax.lax.dot_general(
                ch, w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # [1, P] lane reductions ride ONE MXU ones-contraction (see
            # the 3DGS kernel's logeff): logeff always, the distortion
            # term stacked on extra sublane rows when active
            reds = jnp.where(included, logs, 0.0)  # [P, G]
            P_px = reds.shape[0]
            if depth_row >= 0:
                d = ch[depth_row : depth_row + 1, :]
                wd = w * d
                if compute_distort:
                    # one [2P, G] strict-prefix matmul for both sums
                    AB = jnp.dot(
                        jnp.concatenate([w, wd], axis=0), tri_x,
                        preferred_element_type=jnp.float32,
                    )
                    Ax = AB[:P_px] + aprev_ref[:, 0:1]
                    Bx = AB[P_px:] + bprev_ref[:, 0:1]
                    reds = jnp.concatenate(
                        [reds, 2.0 * w * (d * Ax - Bx)], axis=0
                    )
                    aprev_ref[:, :] += jnp.sum(w, axis=1, keepdims=True)
                    bprev_ref[:, :] += jnp.sum(wd, axis=1, keepdims=True)
                m = (P_prev > 0.5) & (w > 0.0)
                idx = jnp.max(
                    jnp.where(m, lanes, -1), axis=1, keepdims=True
                )
                dmed = jnp.sum(
                    jnp.where(lanes == idx, d, 0.0), axis=1, keepdims=True
                )
                med_ref[:, :] = jnp.where(idx >= 0, dmed, med_ref[:, :])
            lograw_ref[:, :] += jnp.sum(logs, axis=1, keepdims=True)
            red_out = jax.lax.dot_general(
                jnp.ones((1, CHUNK), jnp.float32),
                reds,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, P] or [1, 2P]
            logeff_ref[:, :] += red_out[:, :P_px]
            if depth_row >= 0 and compute_distort:
                dist_ref[:, :] += red_out[:, P_px:]

        return ()

    jax.lax.fori_loop(0, n, body, ())

    color_out_ref[:, :] = acc_ref[:, :]
    trans_out_ref[:, :] = _exp_fast(logeff_ref[:, :])
    dist_out_ref[:, :] = dist_ref[:, :]
    med_out_ref[:, :] = med_ref[:, :]


def _bwd_kernel_2dgs_unaligned(
    offs_ref,  # scalar prefetch [T+1] UNALIGNED offsets
    packed_ref,  # [F, capacity_pad] ANY (raw sorted order)
    tfinal_ref,  # [1, P] (lane-major in HBM; one combined transpose below)
    totq_ref,  # [1, P]
    btot_ref,  # [1, P]
    vch_ref,  # [DA, P]
    valp_ref,  # [1, P]
    vdist_ref,  # [1, P]
    vpacked_ref,  # out [F, capacity_pad] ANY
    buf,  # scratch [3, F, CHUNK] input slots
    sems,  # DMA sems (3,)
    obuf,  # scratch [2, F, CHUNK] flush slots
    osems,  # DMA sems (2,)
    cbuf,  # scratch [F, CHUNK] carry chunk (persists across tiles)
    cflag,  # scratch SMEM [1] int32 carry-valid flag (persists)
    lograw_ref,  # [P, 1]
    prefq_ref,  # [P, 1]
    aprev_ref,  # [P, 1]
    bprev_ref,  # [P, 1]
    gbuf,  # scratch [F, CHUNK] per-chunk grads (zeroed when saturated)
    *,
    tile_size: int, tile_width: int, tiles_per_image: int,
    max_chunks: int, DA: int, depth_row: int, compute_distort: bool,
):
    t = pl.program_id(0)
    px, py = _pixel_coords(tile_size, tile_width, tiles_per_image, t)
    tri = _tri_upper_incl(CHUNK)
    tri_x = _tri_strict_upper(CHUNK)

    start = offs_ref[t]
    end = offs_ref[t + 1]
    raw_count = end - start
    count = jnp.minimum(raw_count, max_chunks * CHUNK)
    truncated = raw_count > max_chunks * CHUNK
    astart = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    s0 = start - astart
    n = pl.cdiv(count, CHUNK)  # compute windows
    span = pl.cdiv(s0 + count, CHUNK)  # aligned input chunks
    m = (s0 + count) // CHUNK  # chunks this tile completes

    lograw_ref[:, :] = jnp.zeros_like(lograw_ref)
    prefq_ref[:, :] = jnp.zeros_like(prefq_ref)
    aprev_ref[:, :] = jnp.zeros_like(aprev_ref)
    bprev_ref[:, :] = jnp.zeros_like(bprev_ref)
    # one combined [5,P]→[P,5] relayout for all per-pixel columns: each
    # separate in-kernel sublane↔lane transpose costs ~0.3 µs/tile
    cols = jnp.concatenate(
        [
            valp_ref[:, :] * tfinal_ref[:, :],
            tfinal_ref[:, :],
            totq_ref[:, :],
            btot_ref[:, :],
            vdist_ref[:, :],
        ],
        axis=0,
    ).T  # [P, 5]
    va_tfin = cols[:, 0:1]
    a_tot = 1.0 - cols[:, 1:2]
    totq_col = cols[:, 2:3]
    btot_col = cols[:, 3:4]
    vd_col = cols[:, 4:5]

    @pl.when(t == 0)
    def _():
        cbuf[:, :] = jnp.zeros_like(cbuf)
        cflag[0] = 1

    @pl.when((cflag[0] == 0) & (count > 0))
    def _():
        cbuf[:, :] = jnp.zeros_like(cbuf)
        cflag[0] = 1

    def dma_in(j):
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(astart + j * CHUNK, CHUNK)],
            buf.at[j % 3],
            sems.at[j % 3],
        )

    def dma_out(slot, chunk_idx):
        return pltpu.make_async_copy(
            obuf.at[slot],
            vpacked_ref.at[:, pl.ds(chunk_idx * CHUNK, CHUNK)],
            osems.at[slot],
        )

    @pl.when(span > 0)
    def _():
        dma_in(0).start()

    @pl.when(span > 1)
    def _():
        dma_in(1).start()

    @pl.when(span > 0)
    def _():
        dma_in(0).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def body(k, _):
        @pl.when(k + 2 < span)
        def _():
            dma_in(k + 2).start()

        @pl.when(k + 1 < span)
        def _():
            dma_in(k + 1).wait()

        combined = jnp.concatenate([buf[k % 3], buf[(k + 1) % 3]], axis=1)
        window = pltpu.roll(combined, -s0, 1)[:, :CHUNK]
        in_range = lane + k * CHUNK < count
        window = jnp.where(in_range, window, 0.0)

        # chunk-level saturation exit mirroring the forward's not_done
        # gate: entries past full saturation were never composited, so
        # their grads are exactly zero — skip the math, stream zeros
        # through the write protocol (round 4)
        not_done = jnp.max(lograw_ref[:, 0:1]) > jnp.log(TRANSMITTANCE_EPS)

        @pl.when(~not_done)
        def _():
            gbuf[:, :] = jnp.zeros_like(gbuf)

        @pl.when(not_done)
        def _():
            alpha, ch, (tmpx, tmpy, rtz, sigma3d, dx, dy, use3d, vis, op) = (
                _chunk_values_2dgs_full(window, px, py, DA)
            )
            one_minus = 1.0 - alpha
            logs = _log1p_neg_fast(alpha, poly=False)
            S = jnp.dot(logs, tri, preferred_element_type=jnp.float32)
            logP = S + lograw_ref[:, 0:1]
            included = logP > jnp.log(TRANSMITTANCE_EPS)
            P_prev = _exp_fast(logP - logs, poly=False)
            w = jnp.where(included, alpha * P_prev, 0.0)

            # Precision matters: Mosaic runs small-K (DA) f32 contractions as
            # single bf16 MXU passes by default; r's ~1% error feeds the
            # suffix cancellation (totq − pref_incl) and decorrelates the
            # geometry grads at scale (measured cos 0.17 on quats/scales).
            # bf16x3 (~1e-5 rel) suffices at 3 MXU passes vs HIGHEST's 6.
            r = _dot_bf16x3(
                vch_ref[:, :], ch, (((0,), (0,)), ((), ())),
            )  # [P, G]
            g_d_extra = None
            if compute_distort and depth_row >= 0:
                d = ch[depth_row : depth_row + 1, :]
                wd = w * d
                # one [2P, G] strict-prefix matmul for both running sums
                # (separate [P, G] tri matmuls pay the MXU fill twice)
                P_px = w.shape[0]
                AB = jnp.dot(
                    jnp.concatenate([w, wd], axis=0), tri_x,
                    preferred_element_type=jnp.float32,
                )
                Ax = AB[:P_px] + aprev_ref[:, 0:1]
                Bx = AB[P_px:] + bprev_ref[:, 0:1]
                vd = vd_col
                r_dist = 2.0 * (d * Ax - Bx) + 2.0 * (
                    (btot_col - Bx - wd) - d * (a_tot - Ax - w)
                )
                r = r + vd * r_dist
                g_d_extra = vd * (2.0 * w * (2.0 * Ax + w - a_tot))  # [P, G]
                aprev_ref[:, :] += jnp.sum(w, axis=1, keepdims=True)
                bprev_ref[:, :] += jnp.sum(wd, axis=1, keepdims=True)

            q = w * r
            pref_incl = (
                jnp.dot(q, tri, preferred_element_type=jnp.float32)
                + prefq_ref[:, 0:1]
            )
            suffix = totq_col - pref_incl
            ra = 1.0 / one_minus
            v_alpha = r * P_prev - suffix * ra + va_tfin * ra
            live = included & (alpha > 0.0)
            v_alpha = jnp.where(live, v_alpha, 0.0)

            unclamped = (op * vis) <= ALPHA_CLAMP
            v_sigma = jnp.where(unclamped, -op * vis * v_alpha, 0.0)
            v_op = jnp.where(unclamped, vis * v_alpha, 0.0)

            v_s3 = jnp.where(use3d, v_sigma, 0.0)
            v_s2 = jnp.where(use3d, 0.0, v_sigma)

            # All 12 geometry/opacity row-reductions collapse into ONE MXU
            # moment matmul against the [1, pxl, pyl] tile-local basis (the
            # 3DGS kernel's pixel-moment trick, _bwd_chunk_grads): every
            # needed row is a moment of one of five per-(pixel, entry)
            # fields. Tile-local coordinates keep the basis representable in
            # the MXU's bf16 passes (global px would round at 2^-8).
            rtz2 = rtz * rtz
            v_tmpx = v_s3 * tmpx * rtz2
            v_tmpy = v_s3 * tmpy * rtz2
            v_tmpz = -v_s3 * sigma3d * rtz
            fields = jnp.concatenate(
                [v_tmpx, v_tmpy, v_tmpz, v_s2, v_op], axis=1
            )  # [P, 5G]
            basis3 = _pixel_moment_basis(tile_size)[0:3]  # [3, P]
            mom = jax.lax.dot_general(
                basis3, fields,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [3, 5G]: rows (Σ·1, Σ·pxl, Σ·pyl) per field
            t_in_img = t % tiles_per_image
            tx0 = ((t_in_img % tile_width) * tile_size).astype(jnp.float32)
            ty0 = ((t_in_img // tile_width) * tile_size).astype(jnp.float32)

            def mrow(i, f):  # moment i of field f, [1, G]
                return mom[i : i + 1, f * CHUNK : (f + 1) * CHUNK]

            mx = window[0:1, :]
            my = window[1:2, :]
            rows = []
            # g_mx = Σ 2 v_s2 (mx − px) = 2((mx − tx0)·m0 − m_pxl)
            rows.append(2.0 * ((mx - tx0) * mrow(0, 3) - mrow(1, 3)))
            rows.append(2.0 * ((my - ty0) * mrow(0, 3) - mrow(2, 3)))
            # NB do not rebind `k` here — it is the fori_loop induction var
            for f in range(3):  # g_t0 = Σ v_tmp
                rows.append(mrow(0, f))
            for f in range(3):  # g_tpx = Σ v_tmp·px = tx0·m0 + m_pxl
                rows.append(tx0 * mrow(0, f) + mrow(1, f))
            for f in range(3):  # g_tpy
                rows.append(ty0 * mrow(0, f) + mrow(2, f))
            rows.append(mrow(0, 4))  # g_op = Σ v_op
            g_ch = jnp.dot(
                vch_ref[:, :], w, preferred_element_type=jnp.float32
            )  # [DA, G]
            if g_d_extra is not None:
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (DA, 1), 0) == depth_row
                ).astype(jnp.float32)
                g_ch = g_ch + onehot * jnp.sum(g_d_extra, axis=0, keepdims=True)
            gout = jnp.concatenate(rows + [g_ch], axis=0)  # [12 + DA, G]
            pad_rows = obuf.shape[1] - gout.shape[0]
            if pad_rows:
                gout = jnp.concatenate(
                    [gout, jnp.zeros((pad_rows, gout.shape[1]), gout.dtype)],
                    axis=0,
                )
            gbuf[:, :] = jnp.where(in_range, gout, 0.0)
            prefq_ref[:, :] += jnp.sum(q, axis=1, keepdims=True)
            lograw_ref[:, :] += jnp.sum(logs, axis=1, keepdims=True)

        # rotate grads back to raw chunk positions (see the 3DGS kernel)
        rolled = pltpu.roll(gbuf[:, :], s0, 1)
        complete = k * CHUNK + (CHUNK - s0) <= count

        @pl.when(complete)
        def _():
            slot = k % 2

            @pl.when(k >= 2)
            def _():
                dma_out(slot, astart // CHUNK + k - 2).wait()

            obuf[slot] = jnp.where(lane >= s0, rolled, cbuf[:, :])
            dma_out(slot, astart // CHUNK + k).start()
            cbuf[:, :] = jnp.where(lane < s0, rolled, 0.0)

        @pl.when(~complete)
        def _():
            cbuf[:, :] = jnp.where(lane < s0, cbuf[:, :], rolled)

        return ()

    jax.lax.fori_loop(0, n, body, ())

    @pl.when(m >= 2)
    def _():
        dma_out((m - 2) % 2, astart // CHUNK + m - 2).wait()

    @pl.when(m >= 1)
    def _():
        dma_out((m - 1) % 2, astart // CHUNK + m - 1).wait()

    last_tile = t == pl.num_programs(0) - 1

    @pl.when(truncated)
    def _():
        pend = (s0 + count) % CHUNK

        @pl.when(pend > 0)
        def _():
            obuf[0] = jnp.where(lane < pend, cbuf[:, :], 0.0)
            dma_out(0, astart // CHUNK + m).start()
            dma_out(0, astart // CHUNK + m).wait()

        gap_first = (start + count) // CHUNK + (pend > 0)
        gap_stop = jnp.where(last_tile, pl.cdiv(end, CHUNK), end // CHUNK)

        obuf[1] = jnp.zeros_like(obuf[1])

        def zbody(c, _):
            dma_out(1, c).start()
            dma_out(1, c).wait()
            return ()

        jax.lax.fori_loop(gap_first, gap_stop, zbody, ())
        cflag[0] = 0

    @pl.when(last_tile & (~truncated))
    def _():
        obuf[0] = cbuf[:, :]
        dma_out(0, (start + count) // CHUNK).start()
        dma_out(0, (start + count) // CHUNK).wait()


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _raster_2dgs_unaligned_core(
    packed,  # [F_pad, capacity_pad] f32 (raw sorted order + slack)
    offsets,  # [T+1] int32 UNALIGNED
    tile_size: int,
    tile_width: int,
    tiles_per_image: int,
    n_total_tiles: int,
    max_chunks: int,
    da: int,
    depth_row: int,
    compute_distort: bool,
):
    out, _ = _raster_2dgs_unaligned_fwd(
        packed, offsets, tile_size, tile_width, tiles_per_image,
        n_total_tiles, max_chunks, da, depth_row, compute_distort,
    )
    return out


def _raster_2dgs_unaligned_fwd(
    packed, offsets, tile_size, tile_width, tiles_per_image, n_total_tiles,
    max_chunks, da, depth_row, compute_distort,
):
    F, capacity = packed.shape
    DA = da
    P = tile_size * tile_size
    assert capacity % CHUNK == 0

    kern = functools.partial(
        _fwd_kernel_2dgs_train,
        tile_size=tile_size,
        tile_width=tile_width,
        tiles_per_image=tiles_per_image,
        max_chunks=max_chunks,
        DA=DA,
        depth_row=depth_row,
        compute_distort=compute_distort,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_total_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((None, DA, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # trans/dist lane-major [1, P] (see the 3DGS kernel); med stays
            # [P, 1] — its select-based update has no MXU reduction form and
            # an in-kernel transpose costs as much as the XLA-side copy
            pl.BlockSpec((None, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, F, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((DA, P), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),  # lograw
            pltpu.VMEM((1, P), jnp.float32),  # logeff (lane-major)
            pltpu.VMEM((P, 1), jnp.float32),  # aprev
            pltpu.VMEM((P, 1), jnp.float32),  # bprev
            pltpu.VMEM((1, P), jnp.float32),  # dist (lane-major)
            pltpu.VMEM((P, 1), jnp.float32),  # med
        ],
    )
    acc_out, trans_out, dist_out, med_out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_total_tiles, DA, P), jnp.float32),
            jax.ShapeDtypeStruct((n_total_tiles, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((n_total_tiles, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((n_total_tiles, P, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret(),
    )(offsets, packed)
    out = (acc_out, trans_out, dist_out, med_out)
    return out, (packed, offsets, acc_out, trans_out, dist_out)


def _raster_2dgs_unaligned_bwd(
    tile_size, tile_width, tiles_per_image, n_total_tiles, max_chunks, da,
    depth_row, compute_distort, residuals, grads,
):
    packed, offsets, acc_out, trans_out, dist_out = residuals
    v_acc, v_trans, v_dist, _v_med = grads  # median is non-differentiable
    F, capacity = packed.shape
    DA = da
    P = tile_size * tile_size

    v_alpha_img = -v_trans  # [T, 1, P]
    tot_q = jnp.sum(v_acc * acc_out, axis=1, keepdims=True)  # [T, 1, P]
    if compute_distort and depth_row >= 0:
        tot_q = tot_q + 2.0 * v_dist * dist_out
        btot = acc_out[:, depth_row : depth_row + 1, :]  # [T, 1, P]
    else:
        v_dist = jnp.zeros_like(v_trans)
        btot = jnp.zeros_like(v_trans)

    kern = functools.partial(
        _bwd_kernel_2dgs_unaligned,
        tile_size=tile_size,
        tile_width=tile_width,
        tiles_per_image=tiles_per_image,
        max_chunks=max_chunks,
        DA=DA,
        depth_row=depth_row,
        compute_distort=compute_distort,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_total_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # packed
            pl.BlockSpec((None, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # tfinal
            pl.BlockSpec((None, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # tot_q
            pl.BlockSpec((None, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # btot
            pl.BlockSpec((None, DA, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # v_acc
            pl.BlockSpec((None, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # v_alpha_img
            pl.BlockSpec((None, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # v_dist
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((3, F, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((2, F, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((F, CHUNK), jnp.float32),  # carry chunk
            pltpu.SMEM((1,), jnp.int32),  # carry-valid flag
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((F, CHUNK), jnp.float32),  # per-chunk grads
        ],
    )
    (v_packed,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((F, capacity), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret(),
    )(offsets, packed, trans_out, tot_q, btot, v_acc, v_alpha_img, v_dist)
    # the padded tail beyond offsets[-1] is never flushed — zero it before
    # the gather-VJP scatter-add (padding ids point at gaussian 0)
    valid = jnp.arange(capacity, dtype=jnp.int32) < offsets[-1]
    v_packed = jnp.where(valid[None, :], v_packed, 0.0)
    return v_packed, None


_raster_2dgs_unaligned_core.defvjp(
    _raster_2dgs_unaligned_fwd, _raster_2dgs_unaligned_bwd
)
