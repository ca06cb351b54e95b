"""A/B driver for the round-3 perf knobs (VERDICT round-4 ask #1).

Times individual bench families (same scene/shapes/scan structure as
bench.py) under a given knob configuration. Knobs are read at module
import, so each configuration must run in a fresh subprocess:

    TDGS_POLY_EXP=0 TDGS_SPLIT_DOTS=1 python tools/bench_ab.py 3dgs 2dgs

Families: 3dgs, exact, 2dgs, eval3d, 3dgs_train, 2dgs_train, eval3d_train.
Prints one JSON line {"family": fps, ...}.
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
N_FRAMES = 20


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


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ab")
    args = make_scene(N)
    means, quats, scales, opacities, sh, viewmats, Ks = args

    try:
        from tdgs.ops.tiling import derive_isect_capacity

        cap = derive_isect_capacity(
            means, quats, scales, opacities, viewmats, Ks, WIDTH, HEIGHT,
            max_tiles_per_gauss=16,
        )
        cap_exact = derive_isect_capacity(
            means, quats, scales, opacities, viewmats, Ks, WIDTH, HEIGHT,
            max_tiles_per_gauss=None,
        )
    except ImportError:  # pre-round-3 tree (bisect worktrees): r02's value
        cap = cap_exact = 1_048_576
    if os.environ.get("TDGS_AB_CAP"):  # capacity A/B override
        cap = int(os.environ["TDGS_AB_CAP"])

    def infer_frame(model):
        kw = dict(
            tile_capacity=1024, isect_capacity=cap, sh_degree=3,
            max_tiles_per_gauss=16,
        )
        if model == "exact":
            kw = dict(tile_capacity=1024, isect_capacity=cap_exact,
                      sh_degree=3, isect_exact=True)

        def frame(carry, i):
            op = opacities * (1.0 + 1e-5 * i.astype(jnp.float32))
            if model == "2dgs":
                out = rasterization_2dgs(
                    means, quats, scales, op, sh, viewmats, Ks,
                    WIDTH, HEIGHT, rasterizer="packed_inference", **kw)
                return carry + out[0].mean(), None
            rast = "eval3d_packed" if model == "eval3d" else "packed_inference"
            img, alpha, _ = rasterization(
                means, quats, scales, op, sh, viewmats, Ks,
                WIDTH, HEIGHT, rasterizer=rast, **kw)
            return carry + img.mean(), None

        return frame

    def train_frame(model):
        def frame(carry, i):
            def loss_fn(means, quats, scales, opacities, sh):
                op = opacities * (1.0 + 1e-5 * i.astype(jnp.float32))
                if model in ("3dgs_train", "eval3d_train"):
                    img, alpha, _ = rasterization(
                        means, quats, scales, op, sh, viewmats, Ks,
                        WIDTH, HEIGHT, sh_degree=3,
                        rasterizer=("packed" if model == "3dgs_train"
                                    else "eval3d_packed"),
                        tile_capacity=1024, max_tiles_per_gauss=16,
                        isect_capacity=cap)
                    return img.mean() + alpha.mean()
                out = rasterization_2dgs(
                    means, quats, scales, op, sh, viewmats, Ks,
                    WIDTH, HEIGHT, sh_degree=3, render_mode="RGB+ED",
                    distloss=True, rasterizer="packed",
                    tile_capacity=1024, max_tiles_per_gauss=16,
                    isect_capacity=cap)
                return out[0].mean() + out[4].mean()

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
                means, quats, scales, opacities, sh)
            return carry + loss + sum(jnp.sum(g[:1]) for g in grads), None

        return frame

    out = {}
    for model in sys.argv[1:]:
        frame = (train_frame(model) if model.endswith("_train")
                 else infer_frame(model))

        def frames(means, quats, scales, opacities, sh, viewmats, Ks):
            acc, _ = jax.lax.scan(frame, jnp.zeros(()), jnp.arange(N_FRAMES))
            return acc

        fn = jax.jit(frames)
        np.asarray(fn(*args))  # warmup/compile; host readback = honest sync
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        dt = time.perf_counter() - t0
        out[model] = round(N_FRAMES / dt, 2)

    from tdgs.ops import rasterize_pallas_packed as _rpp

    out["knobs"] = {  # read the bound values, not the env defaults
        "POLY_EXP": "1" if getattr(_rpp, "_POLY_EXP", False) else "0",
        "SPLIT_DOTS": "1" if getattr(_rpp, "_SPLIT_DOTS", False) else "0",
        "cap": int(cap),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
