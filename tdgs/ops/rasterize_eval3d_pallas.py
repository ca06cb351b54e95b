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

Fully differentiable: the custom-VJP pair below propagates gradients to
the per-entry features AND the per-tile ray rows (TPU counterpart of
RasterizeToPixelsFromWorld3DGSBwd.cu:592), so 3DGUT training runs on the
fast path too. Supports every camera model + rolling-shutter mode the
jnp path does, since pixel rays are precomputed on the XLA side.
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
    _dot_bf16x3,
    _exp_fast,
    _log1p_neg_fast,
    _tri_upper_incl,
    _use_interpret,
)
from tdgs.ops.transforms import (
    quat_normalize,
    quat_rotate,
    quat_scale_to_covar_sym6,
    rotmat_to_quat,
)

# MXU precision for the σ*-chain contractions. σ* = ½(gg − gr²/rr) cancels
# ~1e4-magnitude quadratic forms to O(1): a single bf16 pass (DEFAULT, ~1%
# error) corrupts α entirely (measured; see "Numerics on TPU" in README).
# Mosaic supports only DEFAULT (1 bf16 pass) and HIGHEST (bf16x6) —
# Precision.HIGH raises NotImplementedError in the Pallas lowering
# (measured this round), so HIGHEST it is. Env override for timing
# probes only: TDGS_EVAL3D_MM_PRECISION=default (WRONG numerics).
import os as _os

_MM_PRECISION = (
    jax.lax.Precision.DEFAULT
    if _os.environ.get("TDGS_EVAL3D_MM_PRECISION") == "default"
    else jax.lax.Precision.HIGHEST
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
    central: bool,
):
    """Streaming structure identical to rasterize_pallas_packed.
    _fwd_kernel_unaligned; see there for the DMA-pipeline invariants.

    ``central`` statically specializes for o' ≡ 0 (any central camera
    with a global shutter — pinhole/fisheye/FTheta; distortion bends ray
    directions, never moves the origin): the three o-dependent HIGHEST
    contractions (od6·p6, oo6·p6, o·w) vanish and gg reduces to the
    precomputed mAm, leaving 2 of 5 MXU contractions per chunk."""
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
    dd6 = _sym6_rows(d, d)  # [6, P]
    if not central:
        o = rays_ref[3:6, :]
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
        # [r, P]ᵀ × [r, G] → [P, G]. HIGHEST is load-bearing: Mosaic
        # runs small-K (3/6) f32 contractions as single bf16 MXU passes
        # (~1% error), and σ* = ½(gg − gr²/rr) cancels ~1e4-magnitude
        # quadratic forms — bf16 there corrupts α entirely (measured).
        # Round-5 negative result: the bf16x3 three-pass split is ALSO
        # not enough here — its missing lo·lo term (~4e-6 rel) rides the
        # 1e4-magnitude forms into ~0.04 σ* error → ~4% alpha error,
        # failing kernel-vs-jax parity at atol 5e-3. The fwd σ* chain
        # keeps all six passes.
        return jax.lax.dot_general(
            lhs_rows, rhs_rows,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MM_PRECISION,
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

            if central:
                gr = -mm(d, w_rows)  # [P, G]
                gg = mAm  # [1, G] broadcasts over pixels
            else:
                gr = mm(od6, p6) - mm(d, w_rows)  # [P, G]
                gg = mm(oo6, p6) - 2.0 * mm(o, w_rows) + mAm
            rr = jnp.maximum(mm(dd6, p6), 1e-12)
            sigma = 0.5 * (gg - gr * gr / rr)
            alpha = jnp.minimum(
                ALPHA_CLAMP, op * _exp_fast(-jnp.maximum(sigma, 0.0))
            )
            # t* = −gr/rr > 0 ⇔ gr < 0 (response in front of the camera)
            alpha = jnp.where(
                (gr < 0.0) & (alpha >= ALPHA_THRESHOLD) & in_range, alpha, 0.0
            )

            logs = _log1p_neg_fast(alpha)
            S = jnp.dot(logs, tri, preferred_element_type=jnp.float32)
            logP = S + lograw_ref[:, 0:1]
            included = logP > jnp.log(TRANSMITTANCE_EPS)
            P_prev = _exp_fast(logP - logs)
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
    trans_out_ref[:, :] = _exp_fast(logeff_ref[:, :])


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
        # d_world = Rᵀ d_cam, componentwise (SoA): the [T,P,3]x[3,3]
        # einsum lowers to a layout-hostile batched matmul
        Rt = R_wc[img_of_tile]  # [T, 3, 3]
        d = jnp.stack(
            [
                Rt[:, 0, j, None] * d_cam[..., 0]
                + Rt[:, 1, j, None] * d_cam[..., 1]
                + Rt[:, 2, j, None] * d_cam[..., 2]
                for j in range(3)
            ],
            axis=-1,
        )  # [T, P, 3]
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


def rasterize_to_pixels_eval3d_packed(
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
    """Packed eval3d rasterization (differentiable). Returns
    (render_colors [I, H, W, D], render_alphas [I, H, W, 1]).

    Despite the historical ``_inference`` name this path is fully
    differentiable: the custom-VJP core propagates gradients to the
    per-entry features and the per-tile rays, and the jnp feature/ray
    construction chains them to means/quats/scales/opacities/colors and
    camera poses (counterpart of RasterizeToPixelsFromWorld3DGSBwd.cu)."""
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

    # Per-entry features (recentred per camera; see module docstring).
    # Structure-of-arrays: Σ⁻¹ = R·diag(1/s²)·Rᵀ is quat_scale_to_covar_sym6
    # with inverted scales, kept as 6 component arrays — the einsum form
    # lowered [N,3,3] batched matmuls through XLA's conv emitter with
    # layout copies (~9 ms/frame at N=200k measured in this prep).
    inv_s = 1.0 / jnp.maximum(scales, 1e-8)
    p00, p01, p02, p11, p12, p22 = quat_scale_to_covar_sym6(quats, inv_s)
    prec6 = jnp.stack(
        [p00, p11, p22, 2.0 * p01, 2.0 * p02, 2.0 * p12], axis=-1
    )  # [N, 6]
    m0 = means[None, :, 0] - o_ref[:, None, 0]  # [I, N]
    m1 = means[None, :, 1] - o_ref[:, None, 1]
    m2 = means[None, :, 2] - o_ref[:, None, 2]
    w0 = p00 * m0 + p01 * m1 + p02 * m2  # w = Σ⁻¹ μ', componentwise
    w1 = p01 * m0 + p11 * m1 + p12 * m2
    w2 = p02 * m0 + p12 * m1 + p22 * m2
    w = jnp.stack([w0, w1, w2], axis=-1)  # [I, N, 3]
    mAm = w0 * m0 + w1 * m1 + w2 * m2  # [I, N]

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
    # Measured stride cliff (BENCH_BREAKDOWN_r04.md "Resolution"): with the
    # packed stream narrower than T_total·CHUNK entries the eval3d kernels
    # run ~12% slower end-to-end (34.4 → 30.3 fps at 1080p/200k; every
    # probed capacity below 8160·128 was slow, everything at/above it
    # fast, same code). Pad the minor dim across the cliff — the pad region
    # is never read (reads are bounded by offsets) and costs ~1 MB.
    if capacity + pad < T_total * CHUNK + CHUNK:
        pad = T_total * CHUNK + CHUNK - capacity
    flatten_ids = jnp.pad(flatten_ids, (0, pad))
    # gather VJP = payload-sort + streaming segment-sum (see
    # tdgs/ops/segment_sum_pallas.py); live columns = w(3) mAm(1)
    # prec6(6) opacity(1) colors(D)
    from tdgs.ops.segment_sum_pallas import gather_rows_segsum

    feats = jax.lax.optimization_barrier(feats)
    packed = jax.lax.optimization_barrier(
        gather_rows_segsum(feats, flatten_ids, 11 + D)
    ).T

    # matches _tile_rays_world's use_rs: central cameras with a global
    # shutter have o' ≡ 0, which statically removes 3 of the 5 HIGHEST
    # MXU contractions per chunk in both kernels
    central = not (
        viewmats_rs is not None
        and rolling_shutter != RollingShutterType.GLOBAL
    )
    colors_out, trans_out = _raster_eval3d_core(
        packed, rays, offsets, T_total, max(tile_capacity // CHUNK, 1), D, P,
        central,
    )

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


# ---------------------------------------------------------------------------
# Differentiable eval3d path (training): custom-VJP Pallas pair.
# TPU counterpart of RasterizeToPixelsFromWorld3DGSBwd.cu:592 — gradients
# flow to every packed per-entry feature (w = Σ⁻¹μ', mAm, prec6, opacity,
# colors) and to the per-tile ray rows (d, o'), so XLA's autodiff chains
# them back to means/quats/scales/opacities/colors AND camera poses. The
# write side uses the same cross-tile carry-chunk protocol as the 3DGS
# kernel (rasterize_pallas_packed._bwd_kernel_unaligned).
#
# Chain (same σ* factorization as the forward):
#   v_σ   = −op·vis·v_α                (gated: unclamped, σ>0, live)
#   v_gg  = ½ v_σ,  v_gr = −(gr/rr)·v_σ,  v_rr = ½(gr/rr)²·v_σ
#   v_w   = −d·v_gr − 2o·v_gg                     [3,P]×[P,G] MXU
#   v_p6  = od6·v_gr + dd6·v_rr + oo6·v_gg        [6,P]×[P,G]
#   v_mAm = Σ_p v_gg,  v_op = Σ_p vis·v_α
#   v_d   = (Σ_g P v_gr)·o − Σ_g w·v_gr + 2(Σ_g P v_rr)·d
#   v_o   = (Σ_g P v_gr)·d + 2[(Σ_g P v_gg)·o − Σ_g w·v_gg]
# where Σ_g P·x contractions run as [6,G]×[G,P] matmuls against prec6.


def _pv(G6, vec):
    """Apply the pixel-wise symmetric matrix Σ_g P_g·coef (given as 6 rows
    in prec6 order [p00,p11,p22,2p01,2p02,2p12]) to vec [3, P] → [3, P]."""
    return jnp.concatenate(
        [
            G6[0:1] * vec[0:1] + 0.5 * G6[3:4] * vec[1:2]
            + 0.5 * G6[4:5] * vec[2:3],
            0.5 * G6[3:4] * vec[0:1] + G6[1:2] * vec[1:2]
            + 0.5 * G6[5:6] * vec[2:3],
            0.5 * G6[4:5] * vec[0:1] + 0.5 * G6[5:6] * vec[1:2]
            + G6[2:3] * vec[2:3],
        ],
        axis=0,
    )


def _bwd_kernel_eval3d_unaligned(
    offs_ref,  # scalar prefetch [T+1] UNALIGNED offsets
    packed_ref,  # [F, capacity_pad] ANY (raw sorted order)
    rays_ref,  # [8, P] VMEM: rows 0:3 d_world, 3:6 o'
    tfinal_ref,  # [P, 1]
    totq_ref,  # [P, 1]
    vcol_ref,  # [D, P]
    valp_ref,  # [P, 1]
    vpacked_ref,  # out [Fv, capacity_pad] ANY
    vrays_ref,  # out [8, P] VMEM
    buf,  # scratch [3, F, CHUNK] input slots
    sems,  # DMA sems (3,)
    obuf,  # scratch [2, Fv, CHUNK] flush slots
    osems,  # DMA sems (2,)
    cbuf,  # scratch [Fv, CHUNK] carry chunk (persists across tiles)
    cflag,  # scratch SMEM [1] int32 carry-valid flag (persists)
    lograw_ref,  # [P, 1]
    prefq_ref,  # [P, 1]
    gbuf,  # scratch [Fv, CHUNK] per-chunk grads (zeroed when saturated)
    *,
    max_chunks: int,
    D: int,
    Fv: int,
    central: bool,
):
    t = pl.program_id(0)
    tri = _tri_upper_incl(CHUNK)

    start = offs_ref[t]
    end = offs_ref[t + 1]
    raw_count = end - start
    count = jnp.minimum(raw_count, max_chunks * CHUNK)
    truncated = raw_count > max_chunks * CHUNK
    astart = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    s0 = start - astart
    n = pl.cdiv(count, CHUNK)
    span = pl.cdiv(s0 + count, CHUNK)
    m = (s0 + count) // CHUNK

    lograw_ref[:, :] = jnp.zeros_like(lograw_ref)
    prefq_ref[:, :] = jnp.zeros_like(prefq_ref)
    vrays_ref[:, :] = jnp.zeros_like(vrays_ref)
    va_tfin = valp_ref[:, 0:1] * tfinal_ref[:, 0:1]

    d = rays_ref[0:3, :]  # [3, P]
    dd6 = _sym6_rows(d, d)
    if not central:
        o = rays_ref[3:6, :]
        oo6 = _sym6_rows(o, o)
        od6 = _sym6_rows(o, d)

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

    def mm(lhs_rows, rhs_rows):
        # [r, P]ᵀ × [r, G] → [P, G]; HIGHEST for the same cancellation
        # reason as the forward kernel's mm (see comment there)
        return jax.lax.dot_general(
            lhs_rows, rhs_rows,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MM_PRECISION,
        )

    # HIGHEST on the gradient contractions is load-bearing, not hygiene:
    # σ* cancels ~1e4-magnitude quadratic forms to O(1), so its gradient
    # splits into v_w / v_p6 / v_mAm chains that must cancel the same way
    # when XLA re-sums them per gaussian — bf16-level (1%) noise in these
    # sums leaves ~1%·1e4 ≈ 100× errors on the geometry grads (measured:
    # scales grads decorrelated to cosine 0.02 before this fix).
    def mmp(lhs_rows, v_pg):
        # [r, P] × [P, G] → [r, G] (contract pixels)
        return jax.lax.dot_general(
            lhs_rows, v_pg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MM_PRECISION,
        )

    def mmg(ent_rows, v_pg):
        # [r, G] × [P, G] → [r, P] (contract entries)
        return jax.lax.dot_general(
            ent_rows, v_pg,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MM_PRECISION,
        )

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

        # Chunk-level saturation exit, mirroring the forward kernel's
        # not_done gate: once every pixel's transmittance is below eps,
        # the forward never composited the remaining entries (its own
        # not_done skip), so every gradient this chunk would emit is
        # exactly zero — skip the recompute + six HIGHEST matmuls and
        # stream zeros through the carry-chunk write protocol instead
        # (round 4; the bwd kernels previously ground through pure-zero
        # math on saturated tails).
        not_done = jnp.max(lograw_ref[:, 0:1]) > jnp.log(TRANSMITTANCE_EPS)

        @pl.when(~not_done)
        def _():
            gbuf[:, :] = jnp.zeros_like(gbuf)

        @pl.when(not_done)
        def _():
            w_rows = window[0:3, :]  # [3, G] Σ⁻¹μ'
            mAm = window[3:4, :]
            p6 = window[4:10, :]
            op = window[10:11, :]
            colors = window[11 : 11 + D, :]

            # recompute the forward response (central: o' ≡ 0, see fwd)
            if central:
                gr = -mm(d, w_rows)  # [P, G]
                gg = mAm
            else:
                gr = mm(od6, p6) - mm(d, w_rows)  # [P, G]
                gg = mm(oo6, p6) - 2.0 * mm(o, w_rows) + mAm
            rr_raw = mm(dd6, p6)
            rr = jnp.maximum(rr_raw, 1e-12)
            sigma = 0.5 * (gg - gr * gr / rr)
            vis = _exp_fast(-jnp.maximum(sigma, 0.0), poly=False)
            alpha_raw = op * vis
            alpha = jnp.minimum(ALPHA_CLAMP, alpha_raw)
            alpha = jnp.where(
                (gr < 0.0) & (alpha >= ALPHA_THRESHOLD) & in_range,
                alpha, 0.0,
            )

            one_minus = 1.0 - alpha
            logs = _log1p_neg_fast(alpha, poly=False)
            S = jnp.dot(logs, tri, preferred_element_type=jnp.float32)
            logP = S + lograw_ref[:, 0:1]
            included = logP > jnp.log(TRANSMITTANCE_EPS)
            P_prev = _exp_fast(logP - logs, poly=False)
            wgt = jnp.where(included, alpha * P_prev, 0.0)

            # color contraction: O(1) magnitudes, NOT the σ* cancellation
            # chain — bf16x3 (3 MXU passes) replaces HIGHEST (6) safely
            r = _dot_bf16x3(
                vcol_ref[:, :], colors, (((0,), (0,)), ((), ())),
            )  # [P, G]
            q = wgt * r
            pref_incl = (
                jnp.dot(q, tri, preferred_element_type=jnp.float32)
                + prefq_ref[:, 0:1]
            )
            suffix = totq_ref[:, 0:1] - pref_incl
            ra = 1.0 / one_minus
            v_alpha = r * P_prev - suffix * ra + va_tfin * ra
            live = included & (alpha > 0.0)
            v_alpha = jnp.where(live, v_alpha, 0.0)

            unclamped = alpha_raw <= ALPHA_CLAMP
            v_op = jnp.where(unclamped, vis * v_alpha, 0.0)
            v_sigma = jnp.where(
                unclamped & (sigma > 0.0), -alpha_raw * v_alpha, 0.0
            )
            v_gg = 0.5 * v_sigma
            gr_rr = gr / rr
            v_gr = -gr_rr * v_sigma
            v_rr = jnp.where(
                rr_raw >= 1e-12, 0.5 * gr_rr * gr_rr * v_sigma, 0.0
            )

            # per-entry feature grads
            if central:
                v_w = -mmp(d, v_gr)  # [3, G]
                v_p6 = mmp(dd6, v_rr)  # [6, G]
            else:
                v_w = -mmp(d, v_gr) - 2.0 * mmp(o, v_gg)  # [3, G]
                v_p6 = mmp(od6, v_gr) + mmp(dd6, v_rr) + mmp(oo6, v_gg)
            v_mAm = jnp.sum(v_gg, axis=0, keepdims=True)  # [1, G]
            v_op_row = jnp.sum(v_op, axis=0, keepdims=True)
            v_colors = jnp.dot(
                vcol_ref[:, :], wgt, preferred_element_type=jnp.float32
            )  # [D, G]
            gout = jnp.concatenate(
                [v_w, v_mAm, v_p6, v_op_row, v_colors], axis=0
            )  # [11 + D, G]
            if Fv > gout.shape[0]:
                gout = jnp.concatenate(
                    [gout,
                     jnp.zeros((Fv - gout.shape[0], CHUNK), jnp.float32)],
                    axis=0,
                )
            gbuf[:, :] = jnp.where(in_range, gout, 0.0)

            # per-tile ray grads (pixel-wise contractions over entries).
            # central: o' ≡ 0 kills the G6_gr·o term of v_d, and v_o is
            # discarded upstream (o_prime is a constant zeros array), so
            # only W3_gr and G6_rr survive.
            G6_rr = mmg(p6, v_rr)  # [6, P] = Σ_g prec6·v_rr
            W3_gr = mmg(w_rows, v_gr)  # [3, P] = Σ_g w·v_gr
            if central:
                v_d = -W3_gr + 2.0 * _pv(G6_rr, d)
            else:
                G6_gr = mmg(p6, v_gr)
                G6_gg = mmg(p6, v_gg)
                W3_gg = mmg(w_rows, v_gg)
                v_d = _pv(G6_gr, o) - W3_gr + 2.0 * _pv(G6_rr, d)
                v_o = _pv(G6_gr, d) + 2.0 * (_pv(G6_gg, o) - W3_gg)
                vrays_ref[3:6, :] += v_o
            vrays_ref[0:3, :] += v_d

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _raster_eval3d_core(
    packed,  # [F_pad, capacity_pad] f32 (raw sorted order + slack)
    rays,  # [T, 8, P] f32 (rows 0:3 d_world, 3:6 o')
    offsets,  # [T+1] int32 UNALIGNED
    n_total_tiles: int,
    max_chunks: int,
    d: int,
    p: int,
    central: bool = False,
):
    out, _ = _raster_eval3d_fwd(
        packed, rays, offsets, n_total_tiles, max_chunks, d, p, central
    )
    return out


def _raster_eval3d_fwd(packed, rays, offsets, n_total_tiles, max_chunks, d, p,
                       central=False):
    F, capacity = packed.shape
    D = d
    P = p
    assert capacity % CHUNK == 0

    kern = functools.partial(
        _fwd_kernel_eval3d_unaligned, max_chunks=max_chunks, D=D,
        central=central,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_total_tiles,),
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
            pltpu.VMEM((3, F, CHUNK), jnp.float32),
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
            jax.ShapeDtypeStruct((n_total_tiles, D, P), jnp.float32),
            jax.ShapeDtypeStruct((n_total_tiles, P, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret(),
    )(offsets, packed, rays)
    return (colors_out, trans_out), (packed, rays, offsets, colors_out,
                                     trans_out)


def _raster_eval3d_bwd(n_total_tiles, max_chunks, d, p, central, residuals,
                       grads):
    packed, rays, offsets, colors_out, trans_out = residuals
    v_colors_out, v_trans_out = grads
    F, capacity = packed.shape
    D = d
    P = p
    Fv = F

    v_alpha_img = -v_trans_out
    tot_q = jnp.sum(
        v_colors_out * colors_out, axis=1, keepdims=True
    ).swapaxes(1, 2)

    kern = functools.partial(
        _bwd_kernel_eval3d_unaligned, max_chunks=max_chunks, D=D, Fv=Fv,
        central=central,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_total_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # packed
            pl.BlockSpec((None, 8, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # rays
            pl.BlockSpec((None, P, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # tfinal
            pl.BlockSpec((None, P, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # tot_q
            pl.BlockSpec((None, D, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # v_colors_out
            pl.BlockSpec((None, P, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # v_alpha_img
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # v_packed
            pl.BlockSpec((None, 8, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # v_rays
        ],
        scratch_shapes=[
            pltpu.VMEM((3, F, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((2, Fv, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((Fv, CHUNK), jnp.float32),  # carry chunk
            pltpu.SMEM((1,), jnp.int32),  # carry-valid flag
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((Fv, CHUNK), jnp.float32),  # per-chunk grads
        ],
    )
    v_packed, v_rays = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Fv, capacity), jnp.float32),
            jax.ShapeDtypeStruct((n_total_tiles, 8, P), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret(),
    )(offsets, packed, rays, trans_out, tot_q, v_colors_out, v_alpha_img)
    valid = jnp.arange(capacity, dtype=jnp.int32) < offsets[-1]
    v_packed = jnp.where(valid[None, :], v_packed, 0.0)
    return v_packed, v_rays, None


_raster_eval3d_core.defvjp(_raster_eval3d_fwd, _raster_eval3d_bwd)


# historical name (the path is differentiable; see the wrapper docstring)
rasterize_to_pixels_eval3d_packed_inference = rasterize_to_pixels_eval3d_packed
