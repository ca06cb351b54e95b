"""Pallas TPU tile rasterizer — the production forward/backward kernels.

Replaces the reference's hottest CUDA kernels
(gsplat/cuda/csrc/RasterizeToPixels3DGSFwd.cu / ...Bwd.cu). Design:

- **Pre-gathered per-tile layout.** XLA gathers each tile's (depth-sorted)
  gaussians into dense [T_tiles, k, cap] arrays (cap = tile_capacity,
  features k on the sublane axis, gaussian slots on the 128-lane axis).
  The kernels are then a 1-D grid over tiles with fully pipelined HBM→VMEM
  block DMA — the Pallas analogue of the CUDA kernel's shared-memory
  staging batches (Fwd.cu:115-137).

- **Prefix-product compositing on the MXU.** Per gaussian chunk of G slots,
  cumulative transmittance is exp(cumsum(log1p(-α))) where the cumsum runs
  as a [P,G]x[G,G] triangular matmul — sequential per-pixel loops become
  systolic-array work. The early-exit `break` (Fwd.cu:154) is the prefix
  mask P_k > 1e-4 plus a chunk-level skip once every pixel saturates.

- **Backward without atomics.** The CUDA bwd resolves write races with warp
  reductions + atomicAdd (Bwd.cu:244-275). Here the bwd kernel emits
  per-(tile, slot) gradients; the scatter-add back to per-gaussian params is
  the autodiff transpose of the XLA gather — deterministic segment sums.
  Gradient formulas match Bwd.cu:193-242 exactly, including the
  `opac*vis <= 0.999` clamp gate and the T_final/(1-α) alpha-output term.
  (The background contribution is composed outside the kernel in plain jnp,
  so its gradient arrives through v_render_colors/v_render_alphas.)

Residuals saved for bwd: only the gathered inputs + the forward outputs
(T_out and pre-background colors); everything else is recomputed — the
flash-attention-style trade that keeps HBM traffic minimal.
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
from tdgs.ops.rasterize_jax import (
    ALPHA_CLAMP,
    TRANSMITTANCE_EPS,
    gather_tile_gaussians,
)

# Gaussian slots processed per inner chunk (lane-dim of the compositing
# arrays; one MXU tile wide).
CHUNK = 128


def _tri_incl(g: int, dtype=jnp.float32) -> jnp.ndarray:
    """Upper-triangular (incl. diagonal) ones: M[j,k] = 1 iff j <= k, so
    x @ M is an inclusive cumulative sum along the lane axis."""
    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (row <= col).astype(dtype)


def _pixel_coords(tile_size: int, tile_width: int, tiles_per_image: int, t):
    """Absolute pixel-center coords of tile t's P = ts*ts pixels, [P, 1]."""
    ts = tile_size
    t_in_img = t % tiles_per_image
    tx = (t_in_img % tile_width) * ts
    ty = (t_in_img // tile_width) * ts
    p = jax.lax.broadcasted_iota(jnp.int32, (ts * ts, 1), 0)
    px = (p % ts + tx).astype(jnp.float32) + 0.5
    py = (p // ts + ty).astype(jnp.float32) + 0.5
    return px, py


def _chunk_alpha(means_ref, conics_ref, opac_ref, c0: int, g: int, px, py):
    """Recompute α for one chunk of gaussians: [P, G] arrays.

    Returns (alpha, vis, dx, dy, conic rows). Skip conditions
    (σ<0, α<1/255) are folded into α=0, matching Fwd.cu:147-149.
    """
    sl = pl.ds(c0, g)
    mx = means_ref[0:1, sl]  # [1, G]
    my = means_ref[1:2, sl]
    ca = conics_ref[0:1, sl]
    cb = conics_ref[1:2, sl]
    cc = conics_ref[2:3, sl]
    op = opac_ref[0:1, sl]

    dx = mx - px  # [P, G]
    dy = my - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    vis = jnp.exp(-sigma)
    alpha = jnp.minimum(ALPHA_CLAMP, op * vis)
    alpha = jnp.where((sigma < 0.0) | (alpha < ALPHA_THRESHOLD), 0.0, alpha)
    return alpha, vis, dx, dy, (ca, cb, cc), op


def _fwd_kernel(
    means_ref,  # [2, cap]
    conics_ref,  # [3, cap]
    colors_ref,  # [D, cap]
    opac_ref,  # [1, cap]
    color_out_ref,  # [D, P]
    trans_out_ref,  # [1, P]
    acc_ref,  # scratch [D, P]
    lograw_ref,  # scratch [1, P]: raw prefix log-product (incl. cut gaussians)
    logeff_ref,  # scratch [1, P]: effective log T (included gaussians only)
    *,
    tile_size: int,
    tile_width: int,
    tiles_per_image: int,
    cap: int,
):
    # Two transmittance carries: inclusion is tested against the RAW prefix
    # product (monotone, so once a pixel crosses 1e-4 it stays excluded —
    # the permanent `done` of the sequential loop), while the rendered alpha
    # uses the EFFECTIVE product over included gaussians only. The two agree
    # up to the cutoff, so raw P_prev is also the correct weight factor.
    t = pl.program_id(0)
    px, py = _pixel_coords(tile_size, tile_width, tiles_per_image, t)
    P = tile_size * tile_size
    tri = _tri_incl(CHUNK)

    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    lograw_ref[:, :] = jnp.zeros_like(lograw_ref)
    logeff_ref[:, :] = jnp.zeros_like(logeff_ref)

    n_chunks = cap // CHUNK

    def body(ci, _):
        c0 = pl.multiple_of(ci * CHUNK, CHUNK)
        # Skip once every pixel is saturated (early-exit analogue) or the
        # chunk is empty (gathered opacity 0 ⇒ α 0 ⇒ no-op).
        not_done = jnp.max(lograw_ref[0:1, :]) > jnp.log(TRANSMITTANCE_EPS)
        has_work = jnp.max(opac_ref[0:1, pl.ds(c0, CHUNK)]) > 0.0

        @pl.when(not_done & has_work)
        def _():
            alpha, _, _, _, _, _ = _chunk_alpha(
                means_ref, conics_ref, opac_ref, c0, CHUNK, px, py
            )
            logs = jnp.log1p(-alpha)  # [P, G]
            S = jnp.dot(logs, tri, preferred_element_type=jnp.float32)
            logP = S + lograw_ref[0:1, :].reshape(P, 1)
            included = logP > jnp.log(TRANSMITTANCE_EPS)
            P_prev = jnp.exp(logP - logs)  # raw T before gaussian k
            w = jnp.where(included, alpha * P_prev, 0.0)  # [P, G]
            # acc[d, p] += colors[d, G] · w[p, G]^T
            cchunk = colors_ref[:, pl.ds(c0, CHUNK)]  # [D, G]
            acc_ref[:, :] += jax.lax.dot_general(
                cchunk,
                w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            lograw_ref[:, :] += jnp.sum(logs, axis=1).reshape(1, P)
            logeff_ref[:, :] += jnp.sum(
                jnp.where(included, logs, 0.0), axis=1
            ).reshape(1, P)

    jax.lax.fori_loop(0, n_chunks, body, None)

    color_out_ref[:, :] = acc_ref[:, :]
    trans_out_ref[:, :] = jnp.exp(logeff_ref[:, :])


def _bwd_kernel(
    means_ref,  # [2, cap]
    conics_ref,  # [3, cap]
    colors_ref,  # [D, cap]
    opac_ref,  # [1, cap]
    tfinal_ref,  # [1, P]  (forward transmittance output)
    totq_ref,  # [1, P]  (Σ_d v_C·C_core, precomputed outside)
    vcol_ref,  # [D, P]  (v_render_colors, pre-background core)
    valp_ref,  # [1, P]  (v_render_alphas w.r.t. α_img = 1 − T)
    v_means_ref,  # out [2, cap]
    v_conics_ref,  # out [3, cap]
    v_colors_ref,  # out [D, cap]
    v_opac_ref,  # out [1, cap]
    lograw_ref,  # scratch [1, P]: raw prefix log-product carry
    prefq_ref,  # scratch [1, P]
    *,
    tile_size: int,
    tile_width: int,
    tiles_per_image: int,
    cap: int,
):
    t = pl.program_id(0)
    px, py = _pixel_coords(tile_size, tile_width, tiles_per_image, t)
    P = tile_size * tile_size
    tri = _tri_incl(CHUNK)

    lograw_ref[:, :] = jnp.zeros_like(lograw_ref)
    prefq_ref[:, :] = jnp.zeros_like(prefq_ref)

    # v_A arrives w.r.t. α_img = 1 − T ⇒ w.r.t. T it is −v_A; the CUDA kernel
    # (Bwd.cu:213) folds the sign by adding +T_final/(1−α)·v_render_a.
    va_tfin = valp_ref[0:1, :] * tfinal_ref[0:1, :]  # [1, P]

    n_chunks = cap // CHUNK

    def body(ci, _):
        c0 = pl.multiple_of(ci * CHUNK, CHUNK)
        not_done = jnp.max(lograw_ref[0:1, :]) > jnp.log(TRANSMITTANCE_EPS)
        has_work = jnp.max(opac_ref[0:1, pl.ds(c0, CHUNK)]) > 0.0

        def compute():
            alpha, vis, dx, dy, (ca, cb, cc), op = _chunk_alpha(
                means_ref, conics_ref, opac_ref, c0, CHUNK, px, py
            )
            one_minus = 1.0 - alpha
            logs = jnp.log1p(-alpha)
            S = jnp.dot(logs, tri, preferred_element_type=jnp.float32)
            logP = S + lograw_ref[0:1, :].reshape(P, 1)
            included = logP > jnp.log(TRANSMITTANCE_EPS)
            P_prev = jnp.exp(logP - logs)
            w = jnp.where(included, alpha * P_prev, 0.0)

            cchunk = colors_ref[:, pl.ds(c0, CHUNK)]  # [D, G]
            # r[p,k] = Σ_d v_C[d,p]·c[d,k]
            r = jax.lax.dot_general(
                vcol_ref[:, :],
                cchunk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [P, G]
            q = w * r
            pref_incl = (
                jnp.dot(q, tri, preferred_element_type=jnp.float32)
                + prefq_ref[0:1, :].reshape(P, 1)
            )
            suffix = totq_ref[0:1, :].reshape(P, 1) - pref_incl
            ra = 1.0 / one_minus
            v_alpha = r * P_prev - suffix * ra + va_tfin.reshape(P, 1) * ra
            live = included & (alpha > 0.0)
            v_alpha = jnp.where(live, v_alpha, 0.0)

            # clamp gate (Bwd.cu:221): no geometry/opacity grad when clamped
            unclamped = (op * vis) <= ALPHA_CLAMP
            v_sigma = jnp.where(unclamped, -op * vis * v_alpha, 0.0)
            v_op = jnp.where(unclamped, vis * v_alpha, 0.0)

            sl = pl.ds(c0, CHUNK)
            # v_colors[d,k] = Σ_p v_C[d,p]·w[p,k]
            v_colors_ref[:, sl] = jax.lax.dot_general(
                vcol_ref[:, :],
                w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            v_conics_ref[0:1, sl] = jnp.sum(0.5 * v_sigma * dx * dx, axis=0)[None, :]
            v_conics_ref[1:2, sl] = jnp.sum(v_sigma * dx * dy, axis=0)[None, :]
            v_conics_ref[2:3, sl] = jnp.sum(0.5 * v_sigma * dy * dy, axis=0)[None, :]
            v_means_ref[0:1, sl] = jnp.sum(v_sigma * (ca * dx + cb * dy), axis=0)[None, :]
            v_means_ref[1:2, sl] = jnp.sum(v_sigma * (cb * dx + cc * dy), axis=0)[None, :]
            v_opac_ref[0:1, sl] = jnp.sum(v_op, axis=0)[None, :]

            prefq_ref[:, :] += jnp.sum(q, axis=1).reshape(1, P)
            lograw_ref[:, :] += jnp.sum(logs, axis=1).reshape(1, P)

        def skip():
            sl = pl.ds(c0, CHUNK)
            v_colors_ref[:, sl] = jnp.zeros_like(v_colors_ref[:, sl])
            v_conics_ref[:, sl] = jnp.zeros_like(v_conics_ref[:, sl])
            v_means_ref[:, sl] = jnp.zeros_like(v_means_ref[:, sl])
            v_opac_ref[:, sl] = jnp.zeros_like(v_opac_ref[:, sl])

        @pl.when(not_done & has_work)
        def _():
            compute()

        @pl.when(jnp.logical_not(not_done & has_work))
        def _():
            skip()

    jax.lax.fori_loop(0, n_chunks, body, None)


def _block(k, cap):
    # Leading None squeezes the tile axis: the kernel sees [k, cap].
    return pl.BlockSpec((None, k, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6)
)
def _raster_core(
    g_means,  # [T, 2, cap]
    g_conics,  # [T, 3, cap]
    g_colors,  # [T, D, cap]
    g_opac,  # [T, 1, cap]
    tile_size: int,
    tile_width: int,
    tiles_per_image: int,
):
    out, _ = _raster_core_fwd(
        g_means, g_conics, g_colors, g_opac, tile_size, tile_width, tiles_per_image
    )
    return out


def _raster_core_fwd(
    g_means, g_conics, g_colors, g_opac, tile_size, tile_width, tiles_per_image
):
    T_tiles, _, cap = g_means.shape
    D = g_colors.shape[1]
    P = tile_size * tile_size
    assert cap % CHUNK == 0, f"tile_capacity must be a multiple of {CHUNK}"

    kern = functools.partial(
        _fwd_kernel,
        tile_size=tile_size,
        tile_width=tile_width,
        tiles_per_image=tiles_per_image,
        cap=cap,
    )
    colors_out, trans_out = pl.pallas_call(
        kern,
        grid=(T_tiles,),
        in_specs=[_block(2, cap), _block(3, cap), _block(D, cap), _block(1, cap)],
        out_specs=[
            pl.BlockSpec((None, D, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_tiles, D, P), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, P), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(g_means, g_conics, g_colors, g_opac)
    residuals = (g_means, g_conics, g_colors, g_opac, colors_out, trans_out)
    return (colors_out, trans_out), residuals


def _raster_core_bwd(tile_size, tile_width, tiles_per_image, residuals, grads):
    g_means, g_conics, g_colors, g_opac, colors_out, trans_out = residuals
    v_colors_out, v_trans_out = grads
    T_tiles, _, cap = g_means.shape
    D = g_colors.shape[1]
    P = tile_size * tile_size

    # The public API differentiates w.r.t. α_img = 1 − T; the core's second
    # output is T, so flip the sign here (callers pass v wrt T directly).
    v_alpha_img = -v_trans_out  # [T, 1, P]
    tot_q = jnp.sum(v_colors_out * colors_out, axis=1, keepdims=True)  # [T,1,P]

    kern = functools.partial(
        _bwd_kernel,
        tile_size=tile_size,
        tile_width=tile_width,
        tiles_per_image=tiles_per_image,
        cap=cap,
    )
    pblock = lambda k: pl.BlockSpec(
        (None, k, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    v_means, v_conics, v_colors, v_opac = pl.pallas_call(
        kern,
        grid=(T_tiles,),
        in_specs=[
            _block(2, cap),
            _block(3, cap),
            _block(D, cap),
            _block(1, cap),
            pblock(1),  # tfinal
            pblock(1),  # tot_q
            pblock(D),  # v_colors_out
            pblock(1),  # v_alpha_img
        ],
        out_specs=[_block(2, cap), _block(3, cap), _block(D, cap), _block(1, cap)],
        out_shape=[
            jax.ShapeDtypeStruct((T_tiles, 2, cap), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 3, cap), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, D, cap), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, cap), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(g_means, g_conics, g_colors, g_opac, trans_out, tot_q, v_colors_out, v_alpha_img)
    return v_means, v_conics, v_colors, v_opac


_raster_core.defvjp(_raster_core_fwd, _raster_core_bwd)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def rasterize_to_pixels_pallas(
    means2d: jnp.ndarray,  # [..., N, 2]
    conics: jnp.ndarray,  # [..., N, 3]
    colors: jnp.ndarray,  # [..., N, D]
    opacities: jnp.ndarray,  # [..., N]
    image_width: int,
    image_height: int,
    tile_size: int,
    isect_offsets: jnp.ndarray,  # [..., tile_height, tile_width]
    flatten_ids: jnp.ndarray,  # [capacity]
    n_isects: jnp.ndarray,  # [] int32
    backgrounds: Optional[jnp.ndarray] = None,  # [..., D]
    tile_capacity: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for rasterize_to_pixels_jax using Pallas kernels.

    The per-tile gather stays in XLA (its autodiff transpose is the
    deterministic scatter-add that replaces the CUDA bwd's atomics); the
    compositing fwd/bwd run as Pallas kernels behind a custom VJP.
    """
    image_dims = means2d.shape[:-2]
    N = means2d.shape[-2]
    D = colors.shape[-1]
    I = math.prod(image_dims) if image_dims else 1
    tile_height, tile_width = isect_offsets.shape[-2:]
    P = tile_size * tile_size

    means2d_f = means2d.reshape(I * N, 2)
    conics_f = conics.reshape(I * N, 3)
    colors_f = colors.reshape(I * N, D)
    opac_f = opacities.reshape(I * N)

    gauss_ids, valid = gather_tile_gaussians(
        isect_offsets.reshape(I, tile_height, tile_width),
        flatten_ids,
        n_isects,
        tile_capacity,
    )  # [T, cap]
    T_tiles = gauss_ids.shape[0]

    g_means = jnp.swapaxes(means2d_f[gauss_ids], 1, 2)  # [T, 2, cap]
    g_conics = jnp.swapaxes(conics_f[gauss_ids], 1, 2)  # [T, 3, cap]
    g_colors = jnp.swapaxes(colors_f[gauss_ids], 1, 2)  # [T, D, cap]
    g_opac = jnp.where(valid, opac_f[gauss_ids], 0.0)[:, None, :]  # [T, 1, cap]

    colors_out, trans_out = _raster_core(
        g_means, g_conics, g_colors, g_opac,
        tile_size, tile_width, tile_height * tile_width,
    )  # [T, D, P], [T, 1, P]

    # Un-tile to images.
    pad_h, pad_w = tile_height * tile_size, tile_width * tile_size
    img = colors_out.reshape(I, tile_height, tile_width, D, tile_size, tile_size)
    img = img.transpose(0, 1, 4, 2, 5, 3).reshape(I, pad_h, pad_w, D)
    alp = 1.0 - trans_out.reshape(I, tile_height, tile_width, tile_size, tile_size)
    alp = alp.transpose(0, 1, 3, 2, 4).reshape(I, pad_h, pad_w)

    img = img[:, :image_height, :image_width, :]
    alp = alp[:, :image_height, :image_width]

    if backgrounds is not None:
        bg = backgrounds.reshape(I, 1, 1, D)
        img = img + (1.0 - alp[..., None]) * bg

    render_colors = img.reshape(image_dims + (image_height, image_width, D))
    render_alphas = alp.reshape(image_dims + (image_height, image_width, 1))
    return render_colors, render_alphas
