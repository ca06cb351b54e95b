"""Benchmark: 1080p render fps on one TPU chip (BASELINE.json metric).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.json): ≥30 fps dynamic 1080p render (+ ≥240 Hz physics
once the physics stage lands) on one v5e chip. vs_baseline = fps / 30.

The scene is synthetic (the domino-scene data isn't shipped): N gaussians
with realistic screen footprints, full pipeline per frame — projection,
SH, tile sort, Pallas rasterization — as one jit program, matching how the
dynamic render loop runs per frame (re-sort every frame).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORM_NAME even if the plugin ignores it


def _probe_backend(timeout_s: float = 300.0) -> bool:
    """True iff the default JAX backend initializes in a fresh subprocess.

    A wedged axon TPU tunnel makes ``jax.devices()`` BLOCK (no exception,
    observed round 2) — so probe in a child with a hard timeout instead of
    touching the backend in-process. Skipped when the env already forces a
    platform (the forced platform is what we'd be probing)."""
    if os.environ.get("JAX_PLATFORM_NAME") or os.environ.get("JAX_PLATFORMS"):
        return True
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__" and not _probe_backend():
    # Emit an honest failure artifact instead of hanging the driver.
    print(json.dumps({
        "metric": "1080p_render_fps", "value": 0.0, "unit": "fps",
        "vs_baseline": 0.0,
        "error": "TPU backend init did not complete within 300s "
                 "(wedged tunnel); last measured values in README.md "
                 "bench table / BENCH_r01.json",
    }))
    sys.exit(0)

import jax
import jax.numpy as jnp
import numpy as np

from tdgs.rendering import rasterization

WIDTH, HEIGHT = 1920, 1080
N = 200_000
BASELINE_FPS = 30.0


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
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    means, quats, scales, opacities, sh, viewmats, Ks = make_scene(N)
    use_pallas = jax.default_backend() == "tpu"

    # Auto-derived from the scene's actual projected footprints (one jitted
    # projection + tile-count pre-pass, 10% headroom, chunk-aligned) — the
    # post-sort feature gather is ROW-COUNT bound (~2.5 ns/row regardless
    # of row width, measured v5e), so an honest tight capacity directly
    # buys fps. Replaces the hand-tuned 1_048_576 (derived: ~1.03M here).
    from tdgs.ops.tiling import derive_isect_capacity

    ISECT_CAP = derive_isect_capacity(
        means, quats, scales, opacities, viewmats, Ks, WIDTH, HEIGHT,
        max_tiles_per_gauss=16,
    )
    # exact coverage (no per-gaussian cap) needs its own, larger bound
    ISECT_CAP_EXACT = derive_isect_capacity(
        means, quats, scales, opacities, viewmats, Ks, WIDTH, HEIGHT,
        max_tiles_per_gauss=None,
    )

    def render(means, quats, scales, opacities, sh, viewmats, Ks):
        img, alpha, meta = rasterization(
            means, quats, scales, opacities, sh, viewmats, Ks,
            WIDTH, HEIGHT,
            sh_degree=3,
            rasterizer="packed_inference" if use_pallas else "jax",
            tile_capacity=1024,
            max_tiles_per_gauss=16,
            isect_capacity=ISECT_CAP,
        )
        return img, alpha, meta["n_dropped"]

    n_frames = 20

    # The real dynamic-render loop runs frames on-device (lax.scan inside
    # one jit, like tdgs.physics.make_step_and_render); benchmarking the
    # same way keeps the remote-tunnel dispatch overhead (~25 ms/dispatch)
    # out of the per-frame number. Each frame perturbs the opacities so no
    # frame can be elided.
    def render_frames(means, quats, scales, opacities, sh, viewmats, Ks):
        def frame(carry, i):
            img, alpha, _ = render(
                means, quats, scales,
                opacities * (1.0 + 1e-5 * i.astype(jnp.float32)),
                sh, viewmats, Ks,
            )
            return carry + img.mean(), None

        acc, _ = jax.lax.scan(frame, jnp.zeros(()), jnp.arange(n_frames))
        return acc

    fn = jax.jit(render_frames)
    args = (means, quats, scales, opacities, sh, viewmats, Ks)
    # NB: through the axon tunnel, block_until_ready returns before device
    # execution completes — a host readback is the only honest sync.
    np.asarray(fn(*args))
    # Allow the handful of K-clamped tiles (46 at this scene: gaussians
    # whose footprint exceeds max_tiles_per_gauss), but catch capacity
    # overflow, which would drop whole tile ranges.
    n_dropped = int(jax.jit(render)(*args)[2])
    assert n_dropped < 100, f"isect_capacity too small: {n_dropped} dropped"

    t0 = time.perf_counter()
    np.asarray(fn(*args))
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    # exact-coverage tiling variant (isect_exact: no per-gaussian tile cap;
    # what trained/big-splat scenes should use) — secondary metric.
    def render_frames_exact(means, quats, scales, opacities, sh, viewmats, Ks):
        def frame(carry, i):
            img, alpha, _ = rasterization(
                means, quats, scales,
                opacities * (1.0 + 1e-5 * i.astype(jnp.float32)),
                sh, viewmats, Ks, WIDTH, HEIGHT, sh_degree=3,
                rasterizer="packed_inference" if use_pallas else "jax",
                tile_capacity=1024, isect_exact=True,
                isect_capacity=ISECT_CAP_EXACT,
            )
            return carry + img.mean(), None

        acc, _ = jax.lax.scan(frame, jnp.zeros(()), jnp.arange(n_frames))
        return acc

    fps_exact = 0.0
    if use_pallas:
        fne = jax.jit(render_frames_exact)
        np.asarray(fne(*args))
        t0 = time.perf_counter()
        np.asarray(fne(*args))
        fps_exact = n_frames / (time.perf_counter() - t0)

    # 2DGS (surfel) fast path at the same scale — secondary metric.
    from tdgs.rendering import rasterization_2dgs

    def render_frames_2dgs(means, quats, scales, opacities, sh, viewmats, Ks):
        def frame(carry, i):
            out = rasterization_2dgs(
                means, quats, scales,
                opacities * (1.0 + 1e-5 * i.astype(jnp.float32)),
                sh, viewmats, Ks, WIDTH, HEIGHT,
                sh_degree=3, tile_capacity=1024, max_tiles_per_gauss=16,
                isect_capacity=ISECT_CAP,
                rasterizer="packed_inference" if use_pallas else "jax",
            )
            return carry + out[0].mean(), None

        acc, _ = jax.lax.scan(frame, jnp.zeros(()), jnp.arange(n_frames))
        return acc

    fps_2dgs = 0.0
    if use_pallas:
        fn2 = jax.jit(render_frames_2dgs)
        np.asarray(fn2(*args))
        t0 = time.perf_counter()
        np.asarray(fn2(*args))
        fps_2dgs = n_frames / (time.perf_counter() - t0)

    # eval3d (world-space / 3DGUT) fast path at the same scale.
    def render_frames_eval3d(means, quats, scales, opacities, sh,
                             viewmats, Ks):
        def frame(carry, i):
            img, alpha, _ = rasterization(
                means, quats, scales,
                opacities * (1.0 + 1e-5 * i.astype(jnp.float32)),
                sh, viewmats, Ks, WIDTH, HEIGHT,
                sh_degree=3, tile_capacity=1024, max_tiles_per_gauss=16,
                isect_capacity=ISECT_CAP, rasterizer="eval3d_packed",
            )
            return carry + img.mean(), None

        acc, _ = jax.lax.scan(frame, jnp.zeros(()), jnp.arange(n_frames))
        return acc

    fps_eval3d = 0.0
    if use_pallas:
        fn3 = jax.jit(render_frames_eval3d)
        np.asarray(fn3(*args))
        t0 = time.perf_counter()
        np.asarray(fn3(*args))
        fps_eval3d = n_frames / (time.perf_counter() - t0)

    # Training-path fps: full forward+backward through the differentiable
    # packed rasterizers (grad w.r.t. all splat params), per frame.
    def make_train_bench(model):
        def step(means, quats, scales, opacities, sh, viewmats, Ks, i):
            def loss_fn(means, quats, scales, opacities, sh):
                op = opacities * (1.0 + 1e-5 * i.astype(jnp.float32))
                if model in ("3dgs", "eval3d"):
                    img, alpha, _ = rasterization(
                        means, quats, scales, op, sh, viewmats, Ks,
                        WIDTH, HEIGHT, sh_degree=3,
                        rasterizer=(
                            "packed" if model == "3dgs" else "eval3d_packed"
                        ),
                        tile_capacity=1024, max_tiles_per_gauss=16,
                        isect_capacity=ISECT_CAP,
                    )
                    return img.mean() + alpha.mean()
                out = rasterization_2dgs(
                    means, quats, scales, op, sh, viewmats, Ks,
                    WIDTH, HEIGHT, sh_degree=3, render_mode="RGB+ED",
                    distloss=True, rasterizer="packed",
                    tile_capacity=1024, max_tiles_per_gauss=16,
                    isect_capacity=ISECT_CAP,
                )
                return out[0].mean() + out[4].mean()

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
                means, quats, scales, opacities, sh
            )
            return loss + sum(jnp.sum(g[:1]) for g in grads)

        def frames(means, quats, scales, opacities, sh, viewmats, Ks):
            def body(c, i):
                return c + step(means, quats, scales, opacities, sh,
                                viewmats, Ks, i), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_frames))
            return acc

        return jax.jit(frames)

    train_fps = {"3dgs": 0.0, "2dgs": 0.0, "eval3d": 0.0}
    if use_pallas:
        for model in train_fps:
            fnt = make_train_bench(model)
            np.asarray(fnt(*args))
            t0 = time.perf_counter()
            np.asarray(fnt(*args))
            train_fps[model] = n_frames / (time.perf_counter() - t0)
    fps_train = train_fps["3dgs"]
    fps_2dgs_train = train_fps["2dgs"]

    # physics stepping rate (the north star's second half: ≥240 Hz). A
    # 16-domino rally stepped on-device via lax.scan.
    from tdgs.physics.bodies import initial_state, make_box_body, stack_bodies
    from tdgs.physics.engine import PhysicsParams, simulate

    bodies = stack_bodies(
        *[
            make_box_body([0.055, 0.21, 0.42], position=[i * 0.42, 0, 0.42])
            for i in range(16)
        ]
    )
    st = initial_state(bodies)
    st = st._replace(v=st.v.at[0, 0].set(0.0))
    params = PhysicsParams(dt=1.0 / 240.0)
    n_steps = 2048
    final, _ = simulate(st, bodies, params, n_steps)  # warmup/compile
    np.asarray(final.x.ravel()[:4])
    t0 = time.perf_counter()
    final, _ = simulate(st, bodies, params, n_steps)
    np.asarray(final.x.ravel()[:4])
    hz = n_steps / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "1080p_render_fps",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "physics_hz": round(hz, 1),
                "physics_vs_baseline": round(hz / 240.0, 2),
                "render_2dgs_fps": round(fps_2dgs, 2),
                "render_exact_fps": round(fps_exact, 2),
                "render_eval3d_fps": round(fps_eval3d, 2),
                "render_train_fps": round(fps_train, 2),
                "render_2dgs_train_fps": round(fps_2dgs_train, 2),
                "render_eval3d_train_fps": round(train_fps["eval3d"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
