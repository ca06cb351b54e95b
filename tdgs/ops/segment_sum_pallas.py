"""Sorted-stream segment sum: the gather-VJP without XLA's scatter-add.

The training paths gather per-entry features with ``feats[ids]`` (ids =
the tile-sorted ``flatten_ids``); the VJP of that gather is a scatter-add
of ~1M 64-byte rows, which XLA executes at ~16.5 ms/step on v5e at 1080p
— the single largest backward cost (the reference solves this with CUDA
atomics, RasterizeToPixels3DGSBwd.cu:244-275).

TPU-first replacement (this module), all streaming-friendly:
1. ONE ``lax.sort`` keyed by gaussian id CARRYING the live gradient
   columns as payload operands (~7 ms for 9 columns at 1M entries) —
   measured faster than sort-then-permute: the permutation gather reads
   1M random 64B rows from a 67 MB table at ~12 ns/row (HBM locality),
   while the sort streams sequentially,
2. a streaming Pallas kernel reduces the now-contiguous segments: each
   block of entries folds into a sliding [F, 256] VMEM window over
   gaussian ids via ONE MXU one-hot contraction; completed 128-id output
   blocks are flushed with double-buffered DMA — every block exactly
   once, in ascending order.

Previously refuted alternatives (README.md perf notes + this round's
measurements): XLA ``segment_sum(indices_are_sorted=True)`` is no faster
than the scatter; the inverse-permutation gather route halved training
fps; sort-then-permutation-gather (13 ms for the gather alone).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tdgs.ops.rasterize_pallas_packed import _dot_exact_rhs

BLK = 128  # output block (ids per flush); also the Mosaic DMA alignment
ENT = 512  # entries folded per grid step (bigger = less per-step overhead)
WIN = 2 * BLK  # accumulator window: two output blocks


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _segsum_kernel(
    sids_ref,  # [1, ENT] int32 sorted segment ids (block of the stream)
    rows_ref,  # [F, ENT] f32 gradient rows (same order)
    out_ref,  # [F, n_out] ANY (HBM) — written in 128-column blocks
    acc,  # scratch [F, WIN] f32 sliding window accumulator (persists)
    fbuf,  # scratch [2, F, BLK] flush slots
    sems,  # DMA sems (2,)
    base_ref,  # SMEM [1] int32: id of acc column 0 (persists)
    *,
    n_out: int,
):
    t = pl.program_id(0)
    last = t == pl.num_programs(0) - 1

    @pl.when(t == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc)
        base_ref[0] = 0

    def dma_for(b):
        # output blocks are flushed in ascending order, one per BLK, so
        # slot parity (b//BLK) % 2 alternates and the slot's previous
        # flight is exactly block b - WIN
        slot = (b // BLK) % 2
        b = pl.multiple_of(b, BLK)
        return pltpu.make_async_copy(
            fbuf.at[slot], out_ref.at[:, pl.ds(b, BLK)], sems.at[slot]
        )

    def flush_one(b):
        slot = (b // BLK) % 2

        @pl.when(b >= WIN)
        def _():
            dma_for(b - WIN).wait()

        fbuf[slot] = acc[:, :BLK]
        dma_for(b).start()
        acc[:, :BLK] = acc[:, BLK:]
        acc[:, BLK:] = jnp.zeros_like(acc[:, BLK:])

    sids = sids_ref[:, :]
    rows = rows_ref[:, :]
    iota_win = jax.lax.broadcasted_iota(jnp.int32, (WIN, ENT), 0)

    # Fold-then-advance: fold every not-yet-folded entry whose id fits the
    # current window, then (only if entries remain beyond it) flush one
    # output block and slide. A single step's entries may span MANY
    # windows (sparse ids after dead-gaussian gaps), so folding must
    # precede each advance — advancing first would move the window past
    # this step's small ids. Remaining entries always satisfy sids >=
    # base: base starts <= min(sids) (global sort) and each advance first
    # folds everything below base + WIN.
    def cond(state):
        _, remaining = state
        return jnp.max(remaining) > 0.0

    def body(state):
        base, remaining = state
        rel = sids - base
        now = remaining * (rel < WIN).astype(jnp.float32)  # [1, ENT]
        # Precision matters: DEFAULT lowers this dot to one bf16 MXU pass
        # and loses 1.8e-3 of gradient (measured at bench scale) — the
        # one-hot is exact in bf16 but the f32 rows lose mantissa in the
        # product. The one-hot RHS is exactly bf16-representable, so the
        # 3-limb split (_dot_exact_rhs) matches HIGHEST bit-for-bit at 3
        # MXU passes instead of 6.
        onehot_t = (iota_win == rel).astype(jnp.float32) * now
        acc[:, :] += _dot_exact_rhs(
            rows, onehot_t, (((1,), (1,)), ((), ())),
        )
        remaining = remaining - now

        @pl.when(jnp.max(remaining) > 0.0)
        def _():
            flush_one(base)

        base = jnp.where(jnp.max(remaining) > 0.0, base + BLK, base)
        return base, remaining

    base, _ = jax.lax.while_loop(
        cond, body, (base_ref[0], jnp.ones((1, ENT), jnp.float32))
    )
    base_ref[0] = base

    @pl.when(last)
    def _():
        # drain: every remaining output block, in order (blocks the stream
        # never reached flush as zeros — the window slide feeds zeros in)
        def dcond(b):
            return b < n_out

        def dbody(b):
            flush_one(b)
            return b + BLK

        bend = jax.lax.while_loop(dcond, dbody, base_ref[0])

        # the kernel must not return with DMAs outstanding
        @pl.when(bend >= BLK)
        def _():
            dma_for(bend - BLK).wait()

        @pl.when(bend >= WIN)
        def _():
            dma_for(bend - WIN).wait()


def sorted_segment_rows_sum(
    rows: jnp.ndarray,  # [F, E] f32, entries grouped by ascending id
    sids: jnp.ndarray,  # [E] int32 sorted nondecreasing, in [0, n_rows)
    n_rows: int,
) -> jnp.ndarray:
    """out[:, g] = sum of rows[:, e] over entries e with sids[e] == g.

    E must be a multiple of 512 and F of 8 (callers pad; padded entries
    must carry zero rows and any id that keeps sids sorted)."""
    F, E = rows.shape
    assert E % ENT == 0 and F % 8 == 0, (F, E)
    n_out = -(-n_rows // BLK) * BLK

    kern = functools.partial(_segsum_kernel, n_out=n_out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(E // ENT,),
        in_specs=[
            pl.BlockSpec((1, ENT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, ENT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((F, WIN), jnp.float32),
            pltpu.VMEM((2, F, BLK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    (out,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((F, n_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret(),
    )(sids.reshape(1, E), rows)
    return out[:, :n_rows]


# ---------------------------------------------------------------------------
# Drop-in gather with a segment-sum VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_segsum(feats, ids, n_live: Optional[int] = None):
    """``feats[ids]`` whose VJP takes the sorted-segment-sum path above.

    ``n_live``: number of leading feature columns that can carry nonzero
    cotangents (callers pad features to a lane-friendly width with zero
    columns whose upstream gradient is structurally zero — the payload
    sort then skips them). None = all columns."""
    return feats[ids]


def _gather_fwd(feats, ids, n_live):
    return feats[ids], (feats.shape, ids)


def _gather_bwd(n_live, res, v_rows):
    (n_rows, F), ids = res
    E = ids.shape[0]
    live = F if n_live is None else n_live
    pad = (-E) % ENT
    F_pad = -(-F // 8) * 8
    vT = v_rows.T  # [F, E] relayout; rows become contiguous slices
    if pad:
        vT = jnp.pad(vT, ((0, 0), (0, pad)))
        # padded entries: id 0 with zero rows — sorts to the front of
        # segment 0 and contributes nothing
        ids = jnp.pad(ids, (0, pad))
    # ONE sort carrying the live gradient columns as payload
    sorted_ops = jax.lax.sort(
        (ids,) + tuple(vT[j] for j in range(live)),
        num_keys=1, is_stable=False,
    )
    sids = sorted_ops[0]
    stream = jnp.concatenate(
        [jnp.stack(sorted_ops[1:], axis=0),
         jnp.zeros((F_pad - live, E + pad), jnp.float32)],
        axis=0,
    )
    out = sorted_segment_rows_sum(stream, sids, n_rows)
    return out[:F].T, None


gather_rows_segsum.defvjp(_gather_fwd, _gather_bwd)
