"""Scale sweep: render/train fps vs gaussian count on one TPU chip.

The north-star bench (bench.py) fixes N=200k; this harness measures how
the pipeline scales as scenes grow (the reference's MipNeRF-360 runs span
0.36M-4M gaussians; examples/benchmarks/compression/results/*.csv).

``isect_capacity`` is AUTO-DERIVED per point from the scene's actual
projected footprints (tdgs.ops.tiling.derive_isect_capacity: one jitted
projection + tile-count pre-pass, 10% headroom, chunk-aligned) — no
hand-tuned per-scene constants. Each point also records device HBM in use
and the tiling's n_dropped so the ladder is honest about coverage.

    python examples/benchmarks/scale_sweep.py [--train] [--json out.json]

Prints one JSON object:
    {"N": {"render_fps", "train_fps"?, "isect_capacity", "n_isects",
           "n_dropped", "hbm_bytes_in_use"?}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORM_NAME even if the plugin ignores it

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import bench  # noqa: E402  (repo-root bench.py: shared scene builder)
from tdgs.ops.tiling import derive_isect_capacity  # noqa: E402
from tdgs.rendering import rasterization  # noqa: E402

WIDTH, HEIGHT = 1920, 1080


def _hbm_in_use() -> tuple:
    """(bytes, probe_name). The axon PJRT backend does not implement
    memory_stats() (round-4 ladder recorded 0 for every row); fall back to
    summing live committed device arrays — a lower bound (excludes XLA
    temp/workspace buffers), honest as long as the artifact names the
    probe used."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        v = int(stats.get("bytes_in_use", 0) or 0)
        if v:
            return v, "memory_stats"
    except Exception:
        pass
    try:
        total = 0
        for a in jax.live_arrays():
            try:
                total += a.nbytes
            except Exception:
                pass
        if total:
            return int(total), "live_arrays_lower_bound"
    except Exception:
        pass
    return 0, "unavailable"


def measure(n: int, train: bool, frames: int = 20,
            density: str = "trained", isect_mode: str = "capped") -> dict:
    """One ladder point.

    ``density`` picks how splat size scales with N:
    - "trained" (default): per-splat area ∝ 1/N, i.e. total splat area is
      held at the N=200k scene's value. This is how trained scenes behave
      (densification adds splats while shrinking each — the reference's
      0.36M–4M MCMC runs hold `cap_max` total mass, so per-splat scale
      falls as count rises); the ladder then measures how the PIPELINE
      scales with N, not how overdraw scales with N.
    - "fixed": per-splat size constant (the N=200k scene replicated
      denser) — n_isects grows linearly with N; measures overdraw.
    Either way the artifact records n_isects/n_dropped per point, so the
    workload is explicit."""
    args = [jnp.asarray(a) for a in bench.make_scene(n)]
    means, quats, scales, opacities, sh, viewmats, Ks = args
    if density == "trained" and n != 200_000:
        scales = scales * float(np.sqrt(200_000 / n))
        args[2] = scales
    cap = derive_isect_capacity(
        means, quats, scales, opacities, viewmats, Ks, WIDTH, HEIGHT,
        max_tiles_per_gauss=16,
    )
    kw = dict(sh_degree=3, tile_capacity=1024, max_tiles_per_gauss=16,
              isect_capacity=cap)
    if isect_mode == "exact":
        # the reference's two-pass count/cumsum expansion done static-
        # shape. Measured at 1M: NOT a win (55 vs 50 ms tiling) — the
        # [G]-row delta scatter serializes on TPU.
        kw["isect_exact"] = True
    elif isect_mode == "auto":
        # histogram-derived expansion plan (derive_isect_plan docstring):
        # dense at small N, tightly-sized split_k two-population at scale
        from tdgs.ops.tiling import derive_isect_plan

        plan = derive_isect_plan(
            means, quats, scales, opacities, viewmats, Ks, WIDTH, HEIGHT,
            max_tiles_per_gauss=16,
        )
        plan.pop("full_isect_demand")
        if plan.pop("footprint_kmax") > plan["max_tiles_per_gauss"]:
            print(f"N={n}: footprint kmax exceeds cap — coverage clipped "
                  f"(n_dropped below is the honest count)", file=sys.stderr)
        kw.update(plan)
        cap = plan["isect_capacity"]

    out = {"isect_capacity": cap}
    if isect_mode == "auto":
        out["plan"] = {k: v for k, v in kw.items()
                       if k.startswith(("isect_", "max_tiles"))}
    meta = jax.jit(lambda *a: rasterization(
        *a, WIDTH, HEIGHT, rasterizer="packed_inference", **kw)[2])(*args)
    out["n_isects"] = int(np.asarray(meta["n_isects"]))
    out["n_dropped"] = int(np.asarray(meta["n_dropped"]))

    # frames run on-device in one lax.scan (the bench.py pattern): timing
    # per-dispatch through the axon tunnel measures the ~25 ms dispatch
    # overhead, not the chip. Each frame perturbs opacities so none elide.
    def render_frames(m, q, s, o, sh, vm, K):
        def frame(c, i):
            img, _, _ = rasterization(
                m, q, s, o * (1.0 + 1e-5 * i.astype(jnp.float32)), sh,
                vm, K, WIDTH, HEIGHT, rasterizer="packed_inference", **kw)
            return c + img.mean(), None
        acc, _ = jax.lax.scan(frame, jnp.zeros(()), jnp.arange(frames))
        return acc

    f = jax.jit(render_frames)
    np.asarray(f(*args))  # host readback: block_until_ready returns early
    t0 = time.perf_counter()
    np.asarray(f(*args))
    out["render_fps"] = round(frames / (time.perf_counter() - t0), 2)
    out["hbm_bytes_in_use"], out["hbm_probe"] = _hbm_in_use()

    if train:
        steps = max(frames // 2, 5)

        def train_frames(m, q, s, o, sh, vm, K):
            def loss(m, q, s, o, sh, i):
                img, alpha, _ = rasterization(
                    m, q, s, o * (1.0 + 1e-5 * i.astype(jnp.float32)),
                    sh, vm, K, WIDTH, HEIGHT, rasterizer="packed", **kw)
                return img.mean() + alpha.mean()

            def body(c, i):
                l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
                    m, q, s, o, sh, i)
                return c + l + sum(jnp.sum(g[:1]) for g in grads), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(steps))
            return acc

        g = jax.jit(train_frames)
        np.asarray(g(*args))
        t0 = time.perf_counter()
        np.asarray(g(*args))
        out["train_fps"] = round(steps / (time.perf_counter() - t0), 2)
        hbm2, probe2 = _hbm_in_use()
        if hbm2 > out["hbm_bytes_in_use"]:
            out["hbm_bytes_in_use"], out["hbm_probe"] = hbm2, probe2
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sizes", type=str,
        # the reference's working range: 0.36M-4M gaussians
        default="200000,360000,500000,1000000,2000000,4000000",
    )
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--density", choices=("trained", "fixed"),
                    default="trained")
    ap.add_argument("--isect-mode", choices=("capped", "exact", "auto"),
                    default="capped")
    ns = ap.parse_args()

    results = {"density_model": ns.density, "isect_mode": ns.isect_mode}
    for n in (int(s) for s in ns.sizes.split(",")):
        results[str(n)] = measure(n, ns.train, ns.frames, ns.density,
                                  ns.isect_mode)
        print(f"N={n}: {results[str(n)]}", file=sys.stderr, flush=True)
        if ns.json:  # incremental: a crash at 4M still leaves the ladder
            with open(ns.json, "w") as f:
                f.write(json.dumps(results) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
