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

Scope: forward only (rendering/serving); the differentiable 2DGS path is
the jnp rasterizer. Distortion/median-depth outputs (training-loss-only
signals, Fwd.cu:389-438) are not produced here.
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
    _pixel_coords,
    _tri_upper_incl,
    _use_interpret,
)


def _chunk_values_2dgs(buf, px, py, DA: int):
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
    alpha = jnp.minimum(ALPHA_CLAMP, op * jnp.exp(-sigma))
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
            logs = jnp.log1p(-alpha)
            S = jnp.dot(logs, tri, preferred_element_type=jnp.float32)
            logP = S + lograw_ref[:, 0:1]
            included = logP > jnp.log(TRANSMITTANCE_EPS)
            P_prev = jnp.exp(logP - logs)
            w = jnp.where(included, alpha * P_prev, 0.0)
            acc_ref[:, :] += jax.lax.dot_general(
                channels, w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            lograw_ref[:, :] += jnp.sum(logs, axis=1, keepdims=True)
            logeff_ref[:, :] += jnp.sum(
                jnp.where(included, logs, 0.0), axis=1, keepdims=True
            )

        return ()

    jax.lax.fori_loop(0, n, body, ())

    color_out_ref[:, :] = acc_ref[:, :]
    trans_out_ref[:, :] = jnp.exp(logeff_ref[:, :])


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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((None, DA, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, F_pad, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((DA, P), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
        ],
    )
    acc_out, trans_out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_total, DA, P), jnp.float32),
            jax.ShapeDtypeStruct((T_total, P, 1), jnp.float32),
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
