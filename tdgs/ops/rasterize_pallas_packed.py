"""Packed-stream Pallas rasterizer — the speed-of-light production path.

The key observation (measured on v5e): XLA's 2-D ``[n_tiles, cap]`` row
gathers cost ~100ms/frame while a flat gather in sorted order is ~free.
After the (tile, depth) sort, each tile's intersection entries are
CONTIGUOUS — so the kernel can read them with plain dynamic-slice DMAs:

- XLA side: one flat gather builds ``packed[F, capacity]`` (per-entry
  features on sublanes: mx, my, conic a/b/c, opacity, D colors; entries on
  lanes — Mosaic requires the sliced minor dim 128-aligned, which a
  CHUNK=128 entry slice satisfies). Its autodiff transpose is the
  deterministic per-gaussian segment-sum — no atomics, no custom scatter.
- Kernel: grid over tiles; per-tile entry ranges arrive as scalar-prefetch
  offsets; chunks of 128 entries are double-buffered HBM→VMEM (the Pallas
  analogue of the CUDA kernel's shared-memory batches,
  RasterizeToPixels3DGSFwd.cu:115-137).
- Compute layout ``[P=256 sublanes, G=128 lanes]``: the prefix product runs
  as a [P,G]x[G,G] triangular MXU matmul in log space; per-pixel carries
  are [P, 1] columns.
- Backward: same streaming; per-entry gradients are written back with chunk
  DMAs into ``v_packed[Fv, capacity]``. Chunk tails may spill zeros into
  the next tile's range, but grid steps execute sequentially
  (dimension_semantics=arbitrary) so the owning tile's later full write
  wins — race-free by construction; truncated/sentinel ranges are masked
  in XLA afterwards.

Semantics identical to tdgs.ops.rasterize_jax (alpha clamp 0.999, 1/255
skip, exclusive 1e-4 cutoff via the raw-prefix rule).
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

CHUNK = 128

# --------------------------------------------------------------------------
# Polynomial transcendentals — OFF by default (TDGS_POLY_EXP=1 opts in).
# Round-3 micro-benchmarks measured wins in isolation ("2DGS fwd 21.5→17.3
# ms"), but the round-3 driver bench regressed EVERY inference family
# ~10-14% (BENCH_r03 vs r02); the round-4 A/B (BENCH_BREAKDOWN_r04.md)
# pinned the whole regression on this knob: POLY=0 restores 50.3/40.3/50.3
# fps (3dgs/exact/2dgs) vs 43.4/35.6/44.9 with POLY=1, identical chip. The
# polynomial's extra VPU ops (bitcasts, fma chains) do not hide under the
# fused fwd pipeline the way the HW transcendentals do.
# --------------------------------------------------------------------------
import os as _os

_POLY_EXP = _os.environ.get("TDGS_POLY_EXP", "0") != "0"
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453
_SQRT2 = 1.4142135623730951


def _exp_fast(x, poly="global"):
    """e^x for x ≤ 0 (compositing visibilities): 2^n·poly(f) with the 2^n
    scale built from exponent bits. Max rel err ~2.4e-6 on the live range
    (alpha threshold is 1/255 — orders of magnitude of slack).

    ``poly``: "global" follows the TDGS_POLY_EXP env default, False always
    keeps the HW op, True always takes the polynomial. The round-4 A/B
    (BENCH_BREAKDOWN_r04.md) found the polynomial is a LOSS in every
    forward kernel except the 2DGS *training* forward (whose distortion/
    median accumulators keep the VPU busy enough to expose the HW
    transcendental's latency), so only that kernel forces True."""
    if poly is False or (poly == "global" and not _POLY_EXP):
        return jnp.exp(x)
    y = x * _LOG2E
    n = jnp.floor(y + 0.5)
    f = y - n  # [-0.5, 0.5]
    # e^{f·ln2} Taylor through degree 5
    p = 1.0 + f * (
        0.6931471805599453
        + f * (0.2402265069591007
               + f * (0.05550410866482158
                      + f * (0.009618129107628477
                             + f * 0.0013333558146428443)))
    )
    n_i = jnp.clip(n, -126.0, 126.0).astype(jnp.int32)
    scale = pltpu.bitcast((n_i + 127) << 23, jnp.float32)
    return jnp.where(y < -125.0, 0.0, p * scale)


def _log1p_neg_fast(a, poly="global"):
    """ln(1 − a) for a ∈ [0, 0.999] (per-entry log-transmittance):
    exponent/mantissa split + atanh series. Max rel err ~1e-7.
    ``poly`` semantics: see _exp_fast."""
    if poly is False or (poly == "global" and not _POLY_EXP):
        return jnp.log1p(-a)
    u = 1.0 - a  # exact in f32 (a ≤ 0.999; u ∈ [1e-3, 1])
    bits = pltpu.bitcast(u, jnp.int32)
    e = jax.lax.shift_right_logical(bits, 23) - 127  # u > 0 always
    m = pltpu.bitcast(
        jax.lax.bitwise_or(
            jax.lax.bitwise_and(bits, 0x007FFFFF), 127 << 23
        ),
        jnp.float32,
    )  # [1, 2)
    big = m > _SQRT2
    m = jnp.where(big, 0.5 * m, m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    t = (m - 1.0) / (m + 1.0)  # |t| ≤ 0.1716
    t2 = t * t
    ln_m = 2.0 * t * (
        1.0 + t2 * (1.0 / 3.0 + t2 * (0.2 + t2 * (1.0 / 7.0)))
    )
    return e * _LN2 + ln_m


_SPLIT_DOTS = _os.environ.get("TDGS_SPLIT_DOTS", "1") != "0"


def _dot_bf16x3(a, b, dims):
    """f32 dot at ~bf16x3 accuracy (rel err ~1e-5) in THREE MXU passes.

    Mosaic lowers Precision.HIGHEST as bf16x6 and rejects Precision.HIGH
    (NotImplementedError, measured) — this hand-rolled split is the
    missing middle tier: hi·hi + hi·lo + lo·hi, where x_lo = x − bf16(x)
    is exact in f32. TDGS_SPLIT_DOTS=0 restores HIGHEST for A/B."""
    dg = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    if not _SPLIT_DOTS:
        return dg(a, b, precision=jax.lax.Precision.HIGHEST)
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    # DEFAULT lowers each f32 dot to ONE bf16 pass (operands are already
    # bf16-representable except the lo terms' trailing bits, ~2^-17 rel)
    return dg(a_hi, b_hi) + (dg(a_hi, b_lo) + dg(a_lo, b_hi))


def _dot_exact_rhs(a, b, dims):
    """f32 dot, EXACT to f32 when b is exactly bf16-representable (one-hot
    masks, 0/1 selectors), in THREE MXU passes instead of HIGHEST's six:
    split a into three bf16 limbs covering all 24 mantissa bits."""
    dg = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    if not _SPLIT_DOTS:
        return dg(a, b, precision=jax.lax.Precision.HIGHEST)
    a1 = a.astype(jnp.bfloat16).astype(jnp.float32)
    r = a - a1
    a2 = r.astype(jnp.bfloat16).astype(jnp.float32)
    a3 = r - a2
    return dg(a1, b) + (dg(a2, b) + dg(a3, b))


def _tri_upper_incl(g: int) -> jnp.ndarray:
    """M[j, k] = 1 iff j <= k: x @ M is an inclusive cumsum along lanes."""
    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (row <= col).astype(jnp.float32)


def _pixel_moment_basis(tile_size: int) -> jnp.ndarray:
    """[8, P] rows (1, pxl, pyl, pxl², pxl·pyl, pyl², 0, 0) in TILE-LOCAL
    pixel-center coordinates — the LHS of the backward kernels' moment
    matmul (padded to 8 sublanes)."""
    P = tile_size * tile_size
    p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    pxl = (p % tile_size).astype(jnp.float32) + 0.5
    pyl = (p // tile_size).astype(jnp.float32) + 0.5
    one = jnp.ones_like(pxl)
    zero = jnp.zeros_like(pxl)
    return jnp.concatenate(
        [one, pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl, zero, zero], axis=0
    )


def _pixel_coords(tile_size: int, tile_width: int, tiles_per_image: int, t):
    """Pixel centers of tile t as [P, 1] columns (P on sublanes)."""
    ts = tile_size
    t_in_img = t % tiles_per_image
    tx = (t_in_img % tile_width) * ts
    ty = (t_in_img // tile_width) * ts
    p = jax.lax.broadcasted_iota(jnp.int32, (ts * ts, 1), 0)
    px = (p % ts + tx).astype(jnp.float32) + 0.5
    py = (p // ts + ty).astype(jnp.float32) + 0.5
    return px, py


def _chunk_values(buf, px, py, D: int, poly="global"):
    """Per-chunk α and colors from a [F, CHUNK] feature block.

    Returns (alpha [P, G], vis, dx, dy, conic rows [1, G], colors [D, G]).
    Padding slots carry opacity 0 (zeroed in XLA) ⇒ α = 0 automatically.
    """
    mx = buf[0:1, :]  # [1, G]
    my = buf[1:2, :]
    ca = buf[2:3, :]
    cb = buf[3:4, :]
    cc = buf[4:5, :]
    op = buf[5:6, :]
    colors = buf[6 : 6 + D, :]  # [D, G]

    dx = mx - px  # [P, G]
    dy = my - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    vis = _exp_fast(-sigma, poly)
    alpha = jnp.minimum(ALPHA_CLAMP, op * vis)
    alpha = jnp.where((sigma < 0.0) | (alpha < ALPHA_THRESHOLD), 0.0, alpha)
    return alpha, vis, dx, dy, (ca, cb, cc, op), colors


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def rasterize_to_pixels_packed(
    means2d: jnp.ndarray,  # [..., N, 2]
    conics: jnp.ndarray,  # [..., N, 3]
    colors: jnp.ndarray,  # [..., N, D]
    opacities: jnp.ndarray,  # [..., N]
    image_width: int,
    image_height: int,
    tile_size: int,
    offsets: jnp.ndarray,  # [T+1] int32 (from isect_tiles_packed)
    flatten_ids: jnp.ndarray,  # [capacity] sorted entry → gaussian id
    backgrounds: Optional[jnp.ndarray] = None,
    tile_capacity: int = 1024,
    absgrad_dummy: Optional[jnp.ndarray] = None,  # [I*N, 2] zeros
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed-stream rasterization: flat feature gather + streaming kernel.

    ``absgrad_dummy``: optional zeros whose gradient accumulates
    |per-(gaussian, tile) screen gradients| (AbsGS; see
    rasterize_jax.absgrad_tap)."""
    image_dims = means2d.shape[:-2]
    N = means2d.shape[-2]
    D = colors.shape[-1]
    I = math.prod(image_dims) if image_dims else 1
    tile_width = math.ceil(image_width / tile_size)
    tile_height = math.ceil(image_height / tile_size)
    T_total = I * tile_width * tile_height

    F_pad = -(-(6 + D) // 8) * 8  # Mosaic: sliced sublane dim % 8 == 0
    feats = jnp.concatenate(
        [
            means2d.reshape(I * N, 2),
            conics.reshape(I * N, 3),
            opacities.reshape(I * N, 1),
            colors.reshape(I * N, D),
            jnp.zeros((I * N, F_pad - 6 - D), means2d.dtype),
        ],
        axis=-1,
    )  # [I*N, F_pad]
    # UNALIGNED stream: no realignment pass. The raw sorted buffer feeds a
    # rolled-window kernel (like the inference path), and the backward
    # kernel writes per-entry grads with a cross-tile carry chunk — the
    # aligned re-layout it replaces cost +CHUNK·T stream entries
    # (1.44M → 2.5M at 1080p: +15 ms on the forward alone).
    capacity = flatten_ids.shape[0]
    pad = (-capacity) % CHUNK + CHUNK  # slack so the last window DMA fits
    ids = jnp.pad(flatten_ids, (0, pad))
    capacity += pad
    entry_valid = (
        jnp.arange(capacity, dtype=jnp.int32) < offsets[-1]
    )
    ids = jnp.where(entry_valid, ids, 0)
    # Materialize feats before gathering: fusing the feature computation
    # into the gather destroys its row-contiguous access pattern. Gather
    # contiguous 64B rows, then transpose (a bandwidth-bound relayout).
    # The gather's VJP is NOT the default scatter-add (16.5 ms/step at
    # 1080p): gather_rows_segsum sorts the per-entry grads by gaussian id
    # (payload-carrying sort) and segment-sums them with a streaming
    # Pallas kernel (tdgs/ops/segment_sum_pallas.py). Only the 6+D live
    # columns ride the sort — the F_pad tail is structurally zero.
    from tdgs.ops.segment_sum_pallas import gather_rows_segsum

    feats = jax.lax.optimization_barrier(feats)
    rows = gather_rows_segsum(feats, ids, 6 + D)  # [capacity, F]
    if absgrad_dummy is not None:
        from tdgs.ops.rasterize_jax import absgrad_tap

        rows = absgrad_tap(rows, absgrad_dummy, ids, entry_valid)
    packed = jax.lax.optimization_barrier(rows).T  # [F, capacity]
    # zero padding slots' opacity AFTER the transpose: a single-row update
    # instead of a full [capacity, F] copy (absgrad_tap ignores opacity)
    packed = packed.at[5:6, :].multiply(entry_valid[None, :].astype(packed.dtype))

    colors_out, trans_out = _raster_unaligned_core(
        packed, offsets, tile_size, tile_width,
        tile_width * tile_height, T_total, max(tile_capacity // CHUNK, 1), D,
    )  # [T, D, P], [T, 1, P]

    pad_h, pad_w = tile_height * tile_size, tile_width * tile_size
    img = colors_out.reshape(I, tile_height, tile_width, D, tile_size, tile_size)
    img = img.transpose(0, 1, 4, 2, 5, 3).reshape(I, pad_h, pad_w, D)
    alp = 1.0 - trans_out.reshape(I, tile_height, tile_width, tile_size, tile_size)
    alp = alp.transpose(0, 1, 3, 2, 4).reshape(I, pad_h, pad_w)
    img = img[:, :image_height, :image_width, :]
    alp = alp[:, :image_height, :image_width]

    if backgrounds is not None:
        img = img + (1.0 - alp[..., None]) * backgrounds.reshape(I, 1, 1, D)

    return (
        img.reshape(image_dims + (image_height, image_width, D)),
        alp.reshape(image_dims + (image_height, image_width, 1)),
    )


# ---------------------------------------------------------------------------
# Inference fast path: unaligned entry ranges, no realignment pass
# ---------------------------------------------------------------------------


def _fwd_kernel_unaligned(
    offs_ref,  # scalar prefetch [T+1] (UNALIGNED offsets)
    packed_ref,  # [F, capacity] ANY (sorted order, no padding)
    color_out_ref,  # [D, P]
    trans_out_ref,  # [1, P] (P on lanes in HBM; transposed from the
    # in-kernel [P, 1] column at the end — the [T, P, 1] layout wasted
    # 127/128 lanes in every XLA op touching it, ~4 ms/step of copies)
    buf,  # scratch [3, F, CHUNK]
    sems,  # DMA sems (3,)
    acc_ref,  # [D, P]
    lograw_ref,  # [P, 1]
    logeff_ref,  # [1, P]
    *,
    tile_size: int,
    tile_width: int,
    tiles_per_image: int,
    max_chunks: int,
    D: int,
):
    """Forward-only kernel reading UNALIGNED per-tile ranges.

    Aligned 128-chunks covering [start, start+count) are streamed through a
    3-slot buffer; each compute chunk takes lanes [s0, s0+128) of two
    consecutive aligned chunks via a dynamic lane rotation (pltpu.roll) —
    Mosaic only allows 128-aligned DMA offsets, and this dodges the whole
    XLA-side realignment pass (~15 ms/frame of scatter at 1080p).
    """
    t = pl.program_id(0)
    px, py = _pixel_coords(tile_size, tile_width, tiles_per_image, t)
    tri = _tri_upper_incl(CHUNK)

    start = offs_ref[t]
    end = offs_ref[t + 1]
    count = jnp.minimum(end - start, max_chunks * CHUNK)
    astart = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    s0 = start - astart
    n = pl.cdiv(count, CHUNK)  # compute chunks
    span = pl.cdiv(s0 + count, CHUNK)  # aligned chunks to stream

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
        # prefetch aligned chunk k+2 into the slot freed by chunk k-1;
        # wait chunk k+1 (started one iteration earlier → overlapped)
        @pl.when(k + 2 < span)
        def _():
            dma(k + 2).start()

        @pl.when(k + 1 < span)
        def _():
            dma(k + 1).wait()

        combined = jnp.concatenate([buf[k % 3], buf[(k + 1) % 3]], axis=1)
        window = pltpu.roll(combined, -s0, 1)[:, :CHUNK]  # [F, G]
        # zero ALL features of out-of-range lanes BEFORE any use: the lanes
        # past `count` read uninitialized VMEM, and NaN·0 = NaN would leak
        # through the color matmul
        in_range = (
            jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + k * CHUNK
            < count
        )
        window = jnp.where(in_range, window, 0.0)

        not_done = jnp.max(lograw_ref[:, 0:1]) > jnp.log(TRANSMITTANCE_EPS)

        @pl.when(not_done)
        def _():
            alpha, _, _, _, _, colors = _chunk_values(window, px, py, D)
            alpha = jnp.where(in_range, alpha, 0.0)
            logs = _log1p_neg_fast(alpha)
            # NB Mosaic lowers f32 dots at full f32 accuracy already;
            # requesting Precision.HIGHEST here costs ~13% frame time for
            # bit-identical output (measured: 47.9 -> 41.1 fps at 1080p,
            # golden-f64 agreement unchanged at ~1e-4)
            S = jnp.dot(logs, tri, preferred_element_type=jnp.float32)
            logP = S + lograw_ref[:, 0:1]
            included = logP > jnp.log(TRANSMITTANCE_EPS)
            P_prev = _exp_fast(logP - logs)
            w = jnp.where(included, alpha * P_prev, 0.0)
            acc_ref[:, :] += jax.lax.dot_general(
                colors, w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            lograw_ref[:, :] += jnp.sum(logs, axis=1, keepdims=True)
            # accumulate logeff directly in [1, P] (P on lanes): the lane
            # reduction runs as a [1,G]x[P,G] MXU contraction — an explicit
            # [P,1]→[1,P] relayout at the end costs ~0.3 µs/tile (~2.7
            # ms/step over the grid), the extra dot is ~free
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


def rasterize_to_pixels_packed_inference(
    means2d: jnp.ndarray,  # [..., N, 2]
    conics: jnp.ndarray,  # [..., N, 3]
    colors: jnp.ndarray,  # [..., N, D]
    opacities: jnp.ndarray,  # [..., N]
    image_width: int,
    image_height: int,
    tile_size: int,
    offsets: jnp.ndarray,  # [T+1] int32 UNALIGNED (from isect_tiles_packed)
    flatten_ids: jnp.ndarray,  # [capacity]
    backgrounds: Optional[jnp.ndarray] = None,
    tile_capacity: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-only packed rasterization without the realignment pass —
    ~25% faster per frame; NOT differentiable (use
    rasterize_to_pixels_packed for training)."""
    image_dims = means2d.shape[:-2]
    N = means2d.shape[-2]
    D = colors.shape[-1]
    I = math.prod(image_dims) if image_dims else 1
    tile_width = math.ceil(image_width / tile_size)
    tile_height = math.ceil(image_height / tile_size)
    T_total = I * tile_width * tile_height
    P = tile_size * tile_size

    F_pad = -(-(6 + D) // 8) * 8
    feats = jnp.concatenate(
        [
            means2d.reshape(I * N, 2),
            conics.reshape(I * N, 3),
            opacities.reshape(I * N, 1),
            colors.reshape(I * N, D),
            jnp.zeros((I * N, F_pad - 6 - D), means2d.dtype),
        ],
        axis=-1,
    )
    capacity = flatten_ids.shape[0]
    pad = (-capacity) % CHUNK + CHUNK  # slack so the last window DMA fits
    flatten_ids = jnp.pad(flatten_ids, (0, pad))
    capacity += pad
    feats = jax.lax.optimization_barrier(feats)
    packed = jax.lax.optimization_barrier(feats[flatten_ids]).T

    kern = functools.partial(
        _fwd_kernel_unaligned,
        tile_size=tile_size,
        tile_width=tile_width,
        tiles_per_image=tile_width * tile_height,
        max_chunks=max(tile_capacity // CHUNK, 1),
        D=D,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_total,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((None, D, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, F_pad, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((D, P), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    colors_out, trans_out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_total, D, P), jnp.float32),
            jax.ShapeDtypeStruct((T_total, 1, P), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret(),
    )(offsets, packed)

    pad_h, pad_w = tile_height * tile_size, tile_width * tile_size
    img = colors_out.reshape(I, tile_height, tile_width, D, tile_size, tile_size)
    img = img.transpose(0, 1, 4, 2, 5, 3).reshape(I, pad_h, pad_w, D)
    alp = 1.0 - trans_out.reshape(I, tile_height, tile_width, tile_size, tile_size)
    alp = alp.transpose(0, 1, 3, 2, 4).reshape(I, pad_h, pad_w)
    img = img[:, :image_height, :image_width, :]
    alp = alp[:, :image_height, :image_width]
    if backgrounds is not None:
        img = img + (1.0 - alp[..., None]) * backgrounds.reshape(I, 1, 1, D)
    return (
        img.reshape(image_dims + (image_height, image_width, D)),
        alp.reshape(image_dims + (image_height, image_width, 1)),
    )


# ---------------------------------------------------------------------------
# Differentiable UNALIGNED path: training without a realignment pass
# ---------------------------------------------------------------------------
#
# An earlier training path re-laid every tile's entry range onto 128-lane
# boundaries (a scatter-based realignment pass) because the backward kernel
# writes per-entry gradient chunks with DMA, and Mosaic DMA offsets must be
# 128-aligned. The rounding cost up to +CHUNK·T entries of stream (at
# 1080p: 1.44M → 2.5M rows through the feature gather and both kernels —
# measured +15 ms on the forward alone).
#
# This path streams the raw sorted buffer directly (the inference kernel's
# 3-slot rolled-window read) and solves the write side with a CROSS-TILE
# CARRY CHUNK: per-entry grads are rotated back into raw-stream chunk
# positions; a chunk is flushed exactly when its 128 lanes are complete,
# and the trailing partial chunk stays in a VMEM carry buffer that the
# NEXT tile completes (tile ranges partition the stream contiguously, and
# the TPU grid is sequential, so the hand-off is race-free).
#
# tile_capacity truncation: the skipped gap gets explicit zero-flushes, and
# the carry is invalidated across a truncated tile (≤127 boundary-entry
# grads zero in that overflow case — truncation already zeroes the rest).


def _bwd_chunk_grads(
    window, px, py, tri, lograw, prefq, vcol, va_tfin, totq,
    tx0, ty0, tile_size, D,
):
    """Per-chunk backward math of the unaligned 3DGS kernel.

    window: [F, CHUNK] feature block (out-of-range lanes pre-zeroed).
    Returns (gout [8+D..., CHUNK] rows ordered like the packed features,
    q [P, CHUNK], logs [P, CHUNK])."""
    alpha, vis, dx, dy, (ca, cb, cc, op), colors = _chunk_values(
        window, px, py, D, poly=False
    )
    mx = window[0:1, :]
    my = window[1:2, :]
    one_minus = 1.0 - alpha
    logs = _log1p_neg_fast(alpha, poly=False)
    S = jnp.dot(logs, tri, preferred_element_type=jnp.float32)
    logP = S + lograw
    included = logP > jnp.log(TRANSMITTANCE_EPS)
    P_prev = _exp_fast(logP - logs, poly=False)
    w = jnp.where(included, alpha * P_prev, 0.0)

    # Precision matters: small-K (D=3) f32 dots lower to a single bf16
    # MXU pass by default (~1% error), and r's error feeds the suffix
    # cancellation (totq − pref_incl). bf16x3 (~1e-5 rel) suffices and
    # costs 3 MXU passes vs HIGHEST's 6 — see _dot_bf16x3.
    r = _dot_bf16x3(
        vcol, colors, (((0,), (0,)), ((), ())),
    )  # [P, G]
    q = w * r
    pref_incl = (
        jnp.dot(q, tri, preferred_element_type=jnp.float32) + prefq
    )
    suffix = totq - pref_incl
    ra = 1.0 / one_minus
    v_alpha = r * P_prev - suffix * ra + va_tfin * ra
    live = included & (alpha > 0.0)
    v_alpha = jnp.where(live, v_alpha, 0.0)

    unclamped = (op * vis) <= ALPHA_CLAMP
    v_sigma = jnp.where(unclamped, -op * vis * v_alpha, 0.0)

    basis = _pixel_moment_basis(tile_size)  # [8, P]
    mom = jax.lax.dot_general(
        basis, v_sigma,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [8, G]
    mxl = mx - tx0
    myl = my - ty0
    m0 = mom[0:1, :]
    mpx = mom[1:2, :]
    mpy = mom[2:3, :]
    mxx = mom[3:4, :]
    mxy = mom[4:5, :]
    myy = mom[5:6, :]
    s_dx = mxl * m0 - mpx
    s_dy = myl * m0 - mpy
    s_dxx = mxl * mxl * m0 - 2.0 * mxl * mpx + mxx
    s_dxy = mxl * myl * m0 - mxl * mpy - myl * mpx + mxy
    s_dyy = myl * myl * m0 - 2.0 * myl * mpy + myy
    v_colors = jnp.dot(vcol, w, preferred_element_type=jnp.float32)  # [D, G]
    gout = jnp.concatenate(
        [
            ca * s_dx + cb * s_dy,  # g_mx
            cb * s_dx + cc * s_dy,  # g_my
            0.5 * s_dxx,  # g_ca
            s_dxy,  # g_cb
            0.5 * s_dyy,  # g_cc
            jnp.where(op > 0.0, -m0 / jnp.where(op > 0.0, op, 1.0), 0.0),
            v_colors,
        ],
        axis=0,
    )  # [6 + D, CHUNK]
    return gout, q, logs


def _bwd_kernel_unaligned(
    offs_ref,  # scalar prefetch [T+1] UNALIGNED offsets
    packed_ref,  # [F, capacity_pad] ANY (raw sorted order)
    tfinal_ref,  # [1, P] (P on lanes in HBM; transposed in-kernel)
    totq_ref,  # [1, P]
    vcol_ref,  # [D, P]
    valp_ref,  # [1, P]
    vpacked_ref,  # out [Fv, capacity_pad] ANY
    buf,  # scratch [3, F, CHUNK] input slots
    sems,  # DMA sems (3,)
    obuf,  # scratch [2, Fv, CHUNK] flush slots
    osems,  # DMA sems (2,)
    cbuf,  # scratch [Fv, CHUNK] carry chunk (PERSISTS across tiles)
    cflag,  # scratch SMEM [1] int32 carry-valid flag (persists)
    lograw_ref,  # [P, 1]
    prefq_ref,  # [P, 1]
    gbuf,  # scratch [Fv, CHUNK] per-chunk grads (zeroed when saturated)
    *,
    tile_size: int,
    tile_width: int,
    tiles_per_image: int,
    max_chunks: int,
    D: int,
    Fv: int,
):
    t = pl.program_id(0)
    px, py = _pixel_coords(tile_size, tile_width, tiles_per_image, t)
    tri = _tri_upper_incl(CHUNK)
    t_in_img = t % tiles_per_image
    tx0 = ((t_in_img % tile_width) * tile_size).astype(jnp.float32)
    ty0 = ((t_in_img // tile_width) * tile_size).astype(jnp.float32)

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
    # one combined [2,P]→[P,2] relayout instead of two: each in-kernel
    # sublane↔lane transpose costs ~0.3 µs/tile (≈2.2 ms/step on the grid)
    cols = jnp.concatenate(
        [valp_ref[:, :] * tfinal_ref[:, :], totq_ref[:, :]], axis=0
    ).T  # [P, 2]
    va_tfin = cols[:, 0:1]  # [P, 1]
    totq_col = cols[:, 1:2]  # [P, 1]

    @pl.when(t == 0)
    def _():
        cbuf[:, :] = jnp.zeros_like(cbuf)
        cflag[0] = 1

    # a truncated predecessor leaves the carry positioned for the wrong
    # chunk — start from zeros instead (its pending grads are part of the
    # overflow loss)
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
            gout, q, logs = _bwd_chunk_grads(
                window, px, py, tri, lograw_ref[:, 0:1], prefq_ref[:, 0:1],
                vcol_ref[:, :], va_tfin, totq_col,
                tx0, ty0, tile_size, D,
            )
            gout = jnp.where(in_range, gout, 0.0)
            if Fv > gout.shape[0]:
                gout = jnp.concatenate(
                    [gout,
                     jnp.zeros((Fv - gout.shape[0], CHUNK), jnp.float32)],
                    axis=0,
                )
            gbuf[:, :] = gout
            prefq_ref[:, :] += jnp.sum(q, axis=1, keepdims=True)
            lograw_ref[:, :] += jnp.sum(logs, axis=1, keepdims=True)

        # rotate grads back to raw chunk positions: lane l >= s0 belongs to
        # chunk c0+k, lane l < s0 to chunk c0+k+1
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
            # final partial window: merge own lanes into the carry
            cbuf[:, :] = jnp.where(lane < s0, cbuf[:, :], rolled)

        return ()

    jax.lax.fori_loop(0, n, body, ())

    # drain outstanding flushes (the next tile reuses the slots)
    @pl.when(m >= 2)
    def _():
        dma_out((m - 2) % 2, astart // CHUNK + m - 2).wait()

    @pl.when(m >= 1)
    def _():
        dma_out((m - 1) % 2, astart // CHUNK + m - 1).wait()

    last_tile = t == pl.num_programs(0) - 1

    @pl.when(truncated)
    def _():
        # flush the pending partial chunk, zero-fill the skipped gap's
        # chunks, and invalidate the carry
        pend = (s0 + count) % CHUNK

        @pl.when(pend > 0)
        def _():
            obuf[0] = jnp.where(lane < pend, cbuf[:, :], 0.0)
            dma_out(0, astart // CHUNK + m).start()
            dma_out(0, astart // CHUNK + m).wait()

        gap_first = (start + count) // CHUNK + (pend > 0)
        # the next tile re-writes its own first chunk (carry invalidated);
        # the very last tile has no successor, so zero through its end
        gap_stop = jnp.where(last_tile, pl.cdiv(end, CHUNK), end // CHUNK)

        obuf[1] = jnp.zeros_like(obuf[1])

        def zbody(c, _):
            dma_out(1, c).start()
            dma_out(1, c).wait()
            return ()

        jax.lax.fori_loop(gap_first, gap_stop, zbody, ())
        cflag[0] = 0

    # very last tile: flush whatever remains pending
    @pl.when(last_tile & (~truncated))
    def _():
        obuf[0] = cbuf[:, :]
        dma_out(0, (start + count) // CHUNK).start()
        dma_out(0, (start + count) // CHUNK).wait()


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _raster_unaligned_core(
    packed,  # [F_pad, capacity_pad] f32 (raw sorted order + slack)
    offsets,  # [T+1] int32 UNALIGNED
    tile_size: int,
    tile_width: int,
    tiles_per_image: int,
    n_total_tiles: int,
    max_chunks: int,
    d: int,
):
    out, _ = _raster_unaligned_fwd(
        packed, offsets, tile_size, tile_width, tiles_per_image,
        n_total_tiles, max_chunks, d,
    )
    return out


def _raster_unaligned_fwd(
    packed, offsets, tile_size, tile_width, tiles_per_image, n_total_tiles,
    max_chunks, d,
):
    F, capacity = packed.shape
    D = d
    P = tile_size * tile_size
    assert capacity % CHUNK == 0

    kern = functools.partial(
        _fwd_kernel_unaligned,
        tile_size=tile_size,
        tile_width=tile_width,
        tiles_per_image=tiles_per_image,
        max_chunks=max_chunks,
        D=D,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_total_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((None, D, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, F, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM((D, P), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    colors_out, trans_out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_total_tiles, D, P), jnp.float32),
            jax.ShapeDtypeStruct((n_total_tiles, 1, P), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret(),
    )(offsets, packed)
    return (colors_out, trans_out), (packed, offsets, colors_out, trans_out)


def _raster_unaligned_bwd(
    tile_size, tile_width, tiles_per_image, n_total_tiles, max_chunks, d,
    residuals, grads,
):
    packed, offsets, colors_out, trans_out = residuals
    v_colors_out, v_trans_out = grads
    F, capacity = packed.shape
    D = d
    Fv = F
    P = tile_size * tile_size

    v_alpha_img = -v_trans_out  # [T, 1, P]
    tot_q = jnp.sum(v_colors_out * colors_out, axis=1, keepdims=True)

    kern = functools.partial(
        _bwd_kernel_unaligned,
        tile_size=tile_size,
        tile_width=tile_width,
        tiles_per_image=tiles_per_image,
        max_chunks=max_chunks,
        D=D,
        Fv=Fv,
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
            pl.BlockSpec((None, D, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # v_colors_out
            pl.BlockSpec((None, 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # v_alpha_img
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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
    (v_packed,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Fv, capacity), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret(),
    )(offsets, packed, trans_out, tot_q, v_colors_out, v_alpha_img)
    # the padded tail beyond offsets[-1] is never flushed — zero it before
    # the gather-VJP scatter-add (padding ids point at gaussian 0)
    valid = (
        jnp.arange(capacity, dtype=jnp.int32) < offsets[-1]
    )
    v_packed = jnp.where(valid[None, :], v_packed, 0.0)
    return v_packed, None


_raster_unaligned_core.defvjp(_raster_unaligned_fwd, _raster_unaligned_bwd)
