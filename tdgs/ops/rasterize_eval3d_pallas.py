"""Packed-stream Pallas eval3d (world-space / 3DGUT) rasterizer.

TPU counterpart of the reference's RasterizeToPixelsFromWorld3DGSFwd.cu
(the 3DGUT secondary kernel) on the same streaming skeleton as the 3DGS
production kernel (tdgs.ops.rasterize_pallas_packed._fwd_kernel_unaligned):
sorted intersection entries stream through a 3-slot DMA pipeline and
compositing runs as the log-space prefix product on the MXU.

Response math (same canonical-frame formulation as
tdgs.ops.rasterize_eval3d, docstring there): for a ray o + t·d and a
gaussian (μ, Σ⁻¹), with everything recentred on a per-camera reference
origin o_ref (numerical anchoring — quadratic forms in absolute world
coordinates cancel catastrophically in fp32):

    μ' = μ − o_ref,  o' = o_pix − o_ref  (≡ 0 for a global shutter)
    g·r = o'ᵀΣ⁻¹d − μ'ᵀΣ⁻¹d = od6·p6 − d·w        (w = Σ⁻¹μ')
    |g|² = o'ᵀΣ⁻¹o' − 2o'ᵀΣ⁻¹μ' + μ'ᵀΣ⁻¹μ'       (= oo6·p6 − 2o'·w + mAm)
    σ* = ½(|g|² − (g·r)²/(dᵀΣ⁻¹d)),   keep only t* = −g·r/rr > 0

Each [P pixels, G entries] chunk evaluates five [P,{3,6}]×[{3,6},G]
matmuls on the MXU — the per-pixel ray rows (d, o') arrive as a per-tile
VMEM block, the per-entry rows (w, mAm, p6, opacity, colors) stream with
the entries.

Scope: forward only (rendering/serving — the reference's eval3d training
path stays on the differentiable jnp rasterizer). Supports every camera
model + rolling-shutter mode the jnp path does, since pixel rays are
precomputed on the XLA side.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tdgs.ops.camera_models import (
    FThetaCameraDistortionParameters,
    RollingShutterType,
    shutter_time_from_pixel,
    unproject_pixel,
)
from tdgs.ops.projection import ALPHA_THRESHOLD
from tdgs.ops.rasterize_jax import ALPHA_CLAMP, TRANSMITTANCE_EPS
from tdgs.ops.rasterize_pallas_packed import (
    CHUNK,
    _tri_upper_incl,
    _use_interpret,
)
from tdgs.ops.transforms import (
    quat_normalize,
    quat_rotate,
    quat_to_rotmat,
    rotmat_to_quat,
)


def _sym6_rows(a, b):
    """[6, P] symmetric-product rows of a, b [3, P], ordered to contract
    against prec6 = [p00, p11, p22, 2p01, 2p02, 2p12]."""
    return jnp.concatenate(
        [
            a[0:1] * b[0:1],
            a[1:2] * b[1:2],
            a[2:3] * b[2:3],
            0.5 * (a[0:1] * b[1:2] + a[1:2] * b[0:1]),
            0.5 * (a[0:1] * b[2:3] + a[2:3] * b[0:1]),
            0.5 * (a[1:2] * b[2:3] + a[2:3] * b[1:2]),
        ],
        axis=0,
    )


def _fwd_kernel_eval3d_unaligned(
    offs_ref,  # scalar prefetch [T+1] (UNALIGNED offsets)
    packed_ref,  # [F, capacity] ANY (sorted order)
    rays_ref,  # [8, P] VMEM: rows 0:3 d_world, 3:6 o' (recentred origin)
    color_out_ref,  # [D, P]
    trans_out_ref,  # [P, 1]
    buf,  # scratch [3, F, CHUNK]
    sems,  # DMA sems (3,)
    acc_ref,  # [D, P]
    lograw_ref,  # [P, 1]
    logeff_ref,  # [P, 1]
    *,
    max_chunks: int,
    D: int,
):
    """Streaming structure identical to rasterize_pallas_packed.
    _fwd_kernel_unaligned; see there for the DMA-pipeline invariants."""
    t = pl.program_id(0)
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

    # per-tile ray rows (loop constants)
    d = rays_ref[0:3, :]  # [3, P]
    o = rays_ref[3:6, :]
    dd6 = _sym6_rows(d, d)  # [6, P]
    oo6 = _sym6_rows(o, o)
    od6 = _sym6_rows(o, d)

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

    def mm(lhs_rows, rhs_rows):
        # [r, P]ᵀ × [r, G] → [P, G] on the MXU
        return jax.lax.dot_general(
            lhs_rows, rhs_rows,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def body(k, _):
        @pl.when(k + 2 < span)
        def _():
            dma(k + 2).start()

        @pl.when(k + 1 < span)
        def _():
            dma(k + 1).wait()

        combined = jnp.concatenate([buf[k % 3], buf[(k + 1) % 3]], axis=1)
        window = pltpu.roll(combined, -s0, 1)[:, :CHUNK]  # [F, G]
        in_range = (
            jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + k * CHUNK
            < count
        )
        # zero ALL features of out-of-range lanes BEFORE any use
        window = jnp.where(in_range, window, 0.0)

        not_done = jnp.max(lograw_ref[:, 0:1]) > jnp.log(TRANSMITTANCE_EPS)

        @pl.when(not_done)
        def _():
            w_rows = window[0:3, :]  # [3, G] Σ⁻¹μ'
            mAm = window[3:4, :]  # [1, G]
            p6 = window[4:10, :]  # [6, G]
            op = window[10:11, :]
            colors = window[11 : 11 + D, :]

            gr = mm(od6, p6) - mm(d, w_rows)  # [P, G]
            rr = jnp.maximum(mm(dd6, p6), 1e-12)
            gg = mm(oo6, p6) - 2.0 * mm(o, w_rows) + mAm
            sigma = 0.5 * (gg - gr * gr / rr)
            alpha = jnp.minimum(
                ALPHA_CLAMP, op * jnp.exp(-jnp.maximum(sigma, 0.0))
            )
            # t* = −gr/rr > 0 ⇔ gr < 0 (response in front of the camera)
            alpha = jnp.where(
                (gr < 0.0) & (alpha >= ALPHA_THRESHOLD) & in_range, alpha, 0.0
            )

            logs = jnp.log1p(-alpha)
            S = jnp.dot(logs, tri, preferred_element_type=jnp.float32)
            logP = S + lograw_ref[:, 0:1]
            included = logP > jnp.log(TRANSMITTANCE_EPS)
            P_prev = jnp.exp(logP - logs)
            wgt = jnp.where(included, alpha * P_prev, 0.0)
            acc_ref[:, :] += jax.lax.dot_general(
                colors, wgt,
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


def _tile_rays_world(
    I, tile_width, tile_height, tile_size, image_width, image_height,
    viewmats, Ks, camera_model, radial_coeffs, tangential_coeffs,
    thin_prism_coeffs, ftheta_coeffs, rolling_shutter, viewmats_rs,
):
    """Per-tile world-space pixel rays: (d_world [T, P, 3],
    o_prime [T, P, 3] origins recentred on the start-pose camera center,
    o_ref [I, 3] the reference origins, img_of_tile [T])."""
    tiles_per_image = tile_width * tile_height
    T_total = I * tiles_per_image
    R_wc = viewmats[:, :3, :3]
    t_wc = viewmats[:, :3, 3]
    o_ref = -jnp.einsum("ikj,ik->ij", R_wc, t_wc, precision="highest")

    tile_ids = jnp.arange(T_total, dtype=jnp.int32)
    t_in_img = tile_ids % tiles_per_image
    img_of_tile = tile_ids // tiles_per_image
    tx = (t_in_img % tile_width) * tile_size
    ty = (t_in_img // tile_width) * tile_size
    p = jnp.arange(tile_size * tile_size, dtype=jnp.int32)
    px = (tx[:, None] + p[None, :] % tile_size).astype(jnp.float32) + 0.5
    py = (ty[:, None] + p[None, :] // tile_size).astype(jnp.float32) + 0.5
    pixels = jnp.stack([px, py], axis=-1)  # [T, P, 2]

    def per_cam(arr):
        return None if arr is None else arr[img_of_tile][:, None]

    d_cam = unproject_pixel(
        pixels, Ks[img_of_tile][:, None],
        camera_model=camera_model,
        radial_coeffs=per_cam(radial_coeffs),
        tangential_coeffs=per_cam(tangential_coeffs),
        thin_prism_coeffs=per_cam(thin_prism_coeffs),
        ftheta_coeffs=ftheta_coeffs,
    )  # [T, P, 3] camera frame

    use_rs = (
        viewmats_rs is not None
        and rolling_shutter != RollingShutterType.GLOBAL
    )
    if not use_rs:
        d = jnp.einsum(
            "tkj,tpk->tpj", R_wc[img_of_tile], d_cam, precision="highest"
        )
        o_prime = jnp.zeros_like(d)
    else:
        t_sh = shutter_time_from_pixel(
            pixels, image_width, image_height, rolling_shutter
        )  # [T, P]
        q0 = rotmat_to_quat(R_wc)
        q1 = rotmat_to_quat(viewmats_rs[:, :3, :3])
        sign = jnp.where(
            jnp.sum(q0 * q1, axis=-1, keepdims=True) < 0, -1.0, 1.0
        )
        q0t = q0[img_of_tile][:, None]
        q1t = (q1 * sign)[img_of_tile][:, None]
        q = quat_normalize(
            q0t * (1.0 - t_sh[..., None]) + q1t * t_sh[..., None]
        )
        trans = (
            t_wc[img_of_tile][:, None] * (1.0 - t_sh[..., None])
            + viewmats_rs[:, :3, 3][img_of_tile][:, None] * t_sh[..., None]
        )
        q_inv = q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)
        o_pix = -quat_rotate(q_inv, trans)
        d = quat_rotate(q_inv, d_cam)
        o_prime = o_pix - o_ref[img_of_tile][:, None]
    return d, o_prime, o_ref, img_of_tile


def rasterize_to_pixels_eval3d_packed_inference(
    means: jnp.ndarray,  # [N, 3] world-space
    quats: jnp.ndarray,  # [N, 4] wxyz
    scales: jnp.ndarray,  # [N, 3]
    colors: jnp.ndarray,  # [I, N, D]
    opacities: jnp.ndarray,  # [I, N]
    viewmats: jnp.ndarray,  # [I, 4, 4]
    Ks: jnp.ndarray,  # [I, 3, 3]
    image_width: int,
    image_height: int,
    tile_size: int,
    offsets: jnp.ndarray,  # [T+1] int32 UNALIGNED (isect_tiles_packed)
    flatten_ids: jnp.ndarray,  # [capacity] → indices into I*N
    camera_model: str = "pinhole",
    radial_coeffs: Optional[jnp.ndarray] = None,
    tangential_coeffs: Optional[jnp.ndarray] = None,
    thin_prism_coeffs: Optional[jnp.ndarray] = None,
    ftheta_coeffs: Optional[FThetaCameraDistortionParameters] = None,
    backgrounds: Optional[jnp.ndarray] = None,  # [I, D]
    tile_capacity: int = 1024,
    rolling_shutter: RollingShutterType = RollingShutterType.GLOBAL,
    viewmats_rs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-only packed eval3d rasterization. Returns
    (render_colors [I, H, W, D], render_alphas [I, H, W, 1]).
    NOT differentiable (training uses rasterize_to_pixels_eval3d_jax)."""
    I = viewmats.shape[0]
    N = means.shape[0]
    D = colors.shape[-1]
    tile_width = math.ceil(image_width / tile_size)
    tile_height = math.ceil(image_height / tile_size)
    T_total = I * tile_width * tile_height
    P = tile_size * tile_size

    d, o_prime, o_ref, _ = _tile_rays_world(
        I, tile_width, tile_height, tile_size, image_width, image_height,
        viewmats, Ks, camera_model, radial_coeffs, tangential_coeffs,
        thin_prism_coeffs, ftheta_coeffs, rolling_shutter, viewmats_rs,
    )
    rays = jnp.concatenate(
        [
            d.swapaxes(1, 2),  # [T, 3, P]
            o_prime.swapaxes(1, 2),
            jnp.zeros((T_total, 2, P), jnp.float32),
        ],
        axis=1,
    )  # [T, 8, P]

    # per-entry features (recentred per camera; see module docstring)
    R = quat_to_rotmat(quats)
    inv_s = 1.0 / jnp.maximum(scales, 1e-8)
    M = inv_s[..., :, None] * jnp.swapaxes(R, -1, -2)
    prec = jnp.einsum("nkj,nkl->njl", M, M, precision="highest")
    prec6 = jnp.stack(
        [
            prec[:, 0, 0], prec[:, 1, 1], prec[:, 2, 2],
            2.0 * prec[:, 0, 1], 2.0 * prec[:, 0, 2], 2.0 * prec[:, 1, 2],
        ],
        axis=-1,
    )  # [N, 6]
    mu_p = means[None] - o_ref[:, None]  # [I, N, 3]
    w = jnp.einsum("njk,ink->inj", prec, mu_p, precision="highest")
    mAm = jnp.sum(w * mu_p, axis=-1)  # [I, N]

    F_pad = -(-(11 + D) // 8) * 8
    feats = jnp.concatenate(
        [
            w.reshape(I * N, 3),
            mAm.reshape(I * N, 1),
            jnp.broadcast_to(prec6[None], (I, N, 6)).reshape(I * N, 6),
            opacities.reshape(I * N, 1),
            colors.reshape(I * N, D),
            jnp.zeros((I * N, F_pad - 11 - D), jnp.float32),
        ],
        axis=-1,
    )
    capacity = flatten_ids.shape[0]
    pad = (-capacity) % CHUNK + CHUNK  # slack so the last window DMA fits
    flatten_ids = jnp.pad(flatten_ids, (0, pad))
    feats = jax.lax.optimization_barrier(feats)
    packed = jax.lax.optimization_barrier(feats[flatten_ids]).T

    kern = functools.partial(
        _fwd_kernel_eval3d_unaligned,
        max_chunks=max(tile_capacity // CHUNK, 1),
        D=D,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_total,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((None, 8, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, D, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, F_pad, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((D, P), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
        ],
    )
    colors_out, trans_out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_total, D, P), jnp.float32),
            jax.ShapeDtypeStruct((T_total, P, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret(),
    )(offsets, packed, rays)

    pad_h, pad_w = tile_height * tile_size, tile_width * tile_size
    img = colors_out.reshape(I, tile_height, tile_width, D, tile_size,
                             tile_size)
    img = img.transpose(0, 1, 4, 2, 5, 3).reshape(I, pad_h, pad_w, D)
    alp = 1.0 - trans_out.reshape(I, tile_height, tile_width, tile_size,
                                  tile_size)
    alp = alp.transpose(0, 1, 3, 2, 4).reshape(I, pad_h, pad_w)
    img = img[:, :image_height, :image_width, :]
    alp = alp[:, :image_height, :image_width]
    if backgrounds is not None:
        img = img + (1.0 - alp[..., None]) * backgrounds.reshape(I, 1, 1, D)
    return img, alp[..., None]
