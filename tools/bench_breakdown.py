"""Per-stage on-chip timing breakdown for the training families.

Decomposes each family's train step into: inference forward (fast
kernel), training forward (differentiable kernel incl. distortion /
median for 2DGS), and forward+backward (value_and_grad), plus isolated
micro-timings of the shared pipeline stages (tile sort, feature gather
+ its segment-sum VJP). Subtraction gives the per-stage device cost the
VERDICT round-4 ask #1 wanted committed (BENCH_BREAKDOWN_r04.md).

Usage:  python tools/bench_breakdown.py [3dgs 2dgs eval3d micro]
Prints one JSON dict of milliseconds per frame.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tdgs.rendering import rasterization, rasterization_2dgs

WIDTH, HEIGHT = 1920, 1080
N = 200_000
N_FRAMES = 10


def make_scene(n, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * np.array(
        [3.0, 2.0, 1.0], np.float32
    ) + np.array([0, 0, 8.0], np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.005, 0.03, size=(n, 3)).astype(np.float32)
    opacities = rng.uniform(0.3, 1.0, size=(n,)).astype(np.float32)
    sh = (rng.normal(size=(n, 16, 3)) * 0.2).astype(np.float32)
    viewmats = np.eye(4, dtype=np.float32)[None]
    f = 1400.0
    Ks = np.array(
        [[[f, 0, WIDTH / 2], [0, f, HEIGHT / 2], [0, 0, 1]]], np.float32
    )
    return (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opacities), jnp.asarray(sh),
        jnp.asarray(viewmats), jnp.asarray(Ks),
    )


def timed(fn, args):
    """ms/frame over N_FRAMES lax.scan frames (frame = one call)."""

    def frames(*args):
        def body(c, i):
            return c + fn(*args, i), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(N_FRAMES))
        return acc

    f = jax.jit(frames)
    np.asarray(f(*args))  # compile + honest sync (axon tunnel)
    t0 = time.perf_counter()
    np.asarray(f(*args))
    return round((time.perf_counter() - t0) / N_FRAMES * 1e3, 2)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bd")
    args = make_scene(N)
    means, quats, scales, opacities, sh, viewmats, Ks = args

    from tdgs.ops.tiling import derive_isect_capacity

    cap = derive_isect_capacity(
        means, quats, scales, opacities, viewmats, Ks, WIDTH, HEIGHT,
        max_tiles_per_gauss=16,
    )
    kw = dict(
        tile_capacity=1024, isect_capacity=cap, sh_degree=3,
        max_tiles_per_gauss=16,
    )

    fams = sys.argv[1:] or ["3dgs", "2dgs", "eval3d", "micro"]
    out = {"isect_capacity": int(cap)}

    def render_fn(model, rast):
        def f(means, quats, scales, opacities, sh, viewmats, Ks, i):
            op = opacities * (1.0 + 1e-5 * i.astype(jnp.float32))
            if model == "2dgs":
                o = rasterization_2dgs(
                    means, quats, scales, op, sh, viewmats, Ks,
                    WIDTH, HEIGHT, render_mode="RGB+ED", distloss=True,
                    rasterizer=rast, **kw)
                return o[0].mean() + (o[4].mean() if rast == "packed" else 0.0)
            img, alpha, _ = rasterization(
                means, quats, scales, op, sh, viewmats, Ks,
                WIDTH, HEIGHT, rasterizer=rast, **kw)
            return img.mean() + alpha.mean()

        return f

    for fam in fams:
        if fam == "micro":
            continue
        inf_rast = "eval3d_packed" if fam == "eval3d" else "packed_inference"
        trn_rast = "eval3d_packed" if fam == "eval3d" else "packed"
        out[f"{fam}_fwd_inference_ms"] = timed(render_fn(fam, inf_rast), args)
        out[f"{fam}_fwd_train_ms"] = timed(render_fn(fam, trn_rast), args)

        fn = render_fn(fam, trn_rast)

        def step(means, quats, scales, opacities, sh, viewmats, Ks, i):
            loss, grads = jax.value_and_grad(
                lambda *p: fn(*p, viewmats, Ks, i), argnums=(0, 1, 2, 3, 4)
            )(means, quats, scales, opacities, sh)
            return loss + sum(jnp.sum(g[:1]) for g in grads)

        out[f"{fam}_fwd_bwd_ms"] = timed(step, args)
        out[f"{fam}_bwd_only_ms"] = round(
            out[f"{fam}_fwd_bwd_ms"] - out[f"{fam}_fwd_train_ms"], 2
        )

    if "micro" in fams:
        # tile sort alone
        from tdgs.ops.projection import fully_fused_projection
        from tdgs.ops.tiling import isect_tiles_packed

        import math

        tile_width = math.ceil(WIDTH / 16)
        tile_height = math.ceil(HEIGHT / 16)

        def proj_only(means, quats, scales, opacities, sh, viewmats, Ks, i):
            op = opacities * (1.0 + 1e-5 * i.astype(jnp.float32))
            radii, means2d, depths, conics, comp = fully_fused_projection(
                means, quats, scales, viewmats, Ks, WIDTH, HEIGHT,
                opacities=op,
            )
            return means2d.mean() + depths.mean() + conics.mean()

        out["micro_projection_ms"] = timed(proj_only, args)

        def sort_only(means, quats, scales, opacities, sh, viewmats, Ks, i):
            op = opacities * (1.0 + 1e-5 * i.astype(jnp.float32))
            radii, means2d, depths, conics, comp = fully_fused_projection(
                means, quats, scales, viewmats, Ks, WIDTH, HEIGHT,
                opacities=op,
            )
            isect = isect_tiles_packed(
                means2d, radii, depths, 16, tile_width, tile_height,
                max_tiles_per_gauss=16, capacity=int(cap),
            )
            return (
                jnp.sum(isect.offsets[:8]).astype(jnp.float32)
                + jnp.sum(isect.flatten_ids[:8]).astype(jnp.float32)
            )

        out["micro_proj_sort_ms"] = timed(sort_only, args)

        # feature gather + segment-sum VJP at bench shapes
        from tdgs.ops.segment_sum_pallas import gather_rows_segsum

        F_COLS = 16
        rng = np.random.default_rng(1)
        feats = jnp.asarray(
            rng.normal(size=(N, F_COLS)).astype(np.float32)
        )
        ids = jnp.asarray(
            np.sort(rng.integers(0, N, size=(int(cap),))).astype(np.int32)
        )

        def gather_fwd(feats, i):
            return gather_rows_segsum(
                feats * (1.0 + 1e-5 * i.astype(jnp.float32)), ids, F_COLS
            ).sum()

        out["micro_gather_fwd_ms"] = timed(gather_fwd, (feats,))

        def gather_vjp(feats, i):
            return jax.grad(gather_fwd)(feats, i).sum()

        out["micro_gather_fwd_vjp_ms"] = timed(gather_vjp, (feats,))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
