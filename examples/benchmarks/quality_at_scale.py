"""Quality-at-scale benchmark: train MCMC at reference-scale gaussian caps
on a rich procedural scene and commit the eval table.

The reference ships trained PSNR/SSIM/LPIPS tables at 0.36M-4M gaussians
(examples/benchmarks/compression/results/MipNeRF360.csv:2-5, produced by
examples/benchmarks/mcmc.sh: 30k steps, eval at the end, MipNeRF-360-like
resolution). This image has no network egress, so the captured scenes are
replaced by tdgs.utils.test_data.make_rich_scene (multi-frequency terrain
+ object scatter at 1236x822); the budget, strategy hypers, and stats
schema mirror mcmc.sh. The artifact records everything needed to compare
runs honestly: steps, resolution, num_GS, train wall time, device memory,
and the LPIPS backend (real weights are unavailable offline — eval stats
carry lpips_proxy plus an explicit limitation note).

    python examples/benchmarks/quality_at_scale.py --cap 360000 \
        --steps 7500 --json QUALITY_r05.json

Appends/overwrites the entry for this cap in --json (a dict keyed by cap),
so one artifact accumulates the ladder. Mid-run checkpoints + auto-resume:
a dead TPU tunnel costs minutes, not the run.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cap", type=int, default=360_000)
    ap.add_argument("--steps", type=int, default=7500)
    ap.add_argument("--data-dir", default="data/rich_scene")
    ap.add_argument("--result-dir", default=None)
    ap.add_argument("--json", default=None)
    ap.add_argument("--n-images", type=int, default=40)
    ap.add_argument("--width", type=int, default=1236)
    ap.add_argument("--height", type=int, default=822)
    ap.add_argument("--n-gt", type=int, default=150_000)
    ap.add_argument("--sfm-points", type=int, default=None,
                    help="MCMC starting count (default cap//6, <=120k)")
    ap.add_argument("--ckpt-every", type=int, default=1000)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from tdgs.strategy import MCMCStrategy
    from tdgs.training.config import Config
    from tdgs.training.trainer import Runner
    from tdgs.utils.test_data import make_rich_scene

    sfm = args.sfm_points or min(max(args.cap // 6, 20_000), 120_000)
    result_dir = args.result_dir or f"results/quality_{args.cap}"

    if not os.path.isdir(os.path.join(args.data_dir, "sparse")):
        print(f"[1/3] generating rich scene at {args.data_dir} "
              f"({args.n_gt} GT splats, {args.n_images} views "
              f"{args.width}x{args.height})")
        make_rich_scene(
            args.data_dir, n_images=args.n_images,
            width=args.width, height=args.height,
            n_gt=args.n_gt, sfm_points=120_000,
        )
    else:
        print(f"[1/3] scene exists at {args.data_dir}")

    steps = args.steps
    cfg = Config(
        data_dir=args.data_dir,
        data_factor=1,
        result_dir=result_dir,
        max_steps=steps,
        eval_steps=[steps],
        save_steps=sorted(
            set(range(args.ckpt_every, steps, args.ckpt_every)) | {steps}
        ),
        ply_steps=[],
        init_type="sfm",
        sfm_max_points=sfm,
        # the reference mcmc preset (simple_trainer.py:1597-1618)
        init_opa=0.5,
        init_scale=0.1,
        opacity_reg=0.01,
        scale_reg=0.01,
        sh_degree=3,
        sh_degree_interval=1000,
        background_color=(0.05, 0.05, 0.05),
        strategy=MCMCStrategy(
            cap_max=args.cap,
            refine_start_iter=500,
            refine_stop_iter=max(steps - 500, 1),
            refine_every=100,
        ),
        capacity=args.cap,
        # at >=0.5M caps the dense N*K tile expansion dominates the step;
        # exact coverage sorts isect_capacity rows instead
        isect_exact=args.cap >= 500_000,
        tb_every=200,
    )
    runner = Runner(cfg)

    have = sorted(
        (int(os.path.basename(p)[5:-4]), p)
        for p in glob.glob(os.path.join(result_dir, "ckpts", "ckpt_*.pkl"))
    )
    t0 = time.time()
    prior_wall = 0.0
    wall_file = os.path.join(result_dir, "train_wall.json")
    start = 0
    if have:
        start, newest = have[-1]
        print(f"[2/3] resuming from {newest} (step {start})")
        runner.load_checkpoint(newest)
        if os.path.exists(wall_file):
            prior_wall = json.load(open(wall_file)).get("wall_s", 0.0)
    if start < steps:
        print(f"[2/3] training steps {start + 1}..{steps} at cap {args.cap}")
        runner.train(start_step=start)
        wall = time.time() - t0 + prior_wall
        with open(wall_file, "w") as f:
            json.dump({"wall_s": wall}, f)
        val_path = os.path.join(result_dir, "stats", f"val_step{steps}.json")
        val = json.load(open(val_path))
    else:
        wall = prior_wall
        val = runner.eval(steps)

    from tdgs.utils.logger import device_mem_gb

    entry = {
        "num_GS": val["num_GS"],
        "psnr": round(val["psnr"], 3),
        "ssim": round(val["ssim"], 4),
        "steps": steps,
        "resolution": f"{args.width}x{args.height}",
        "n_train_images": args.n_images,
        "train_wall_s": round(wall, 1),
        "steps_per_sec": round(steps / max(wall, 1e-9), 2),
        "mem_gb": device_mem_gb(),
        "ellipse_time": round(val.get("ellipse_time", 0.0), 3),
        "lpips_impl": val.get("lpips_impl"),
        "backend": jax.default_backend(),
        "scene": "procedural make_rich_scene (no network egress; "
                 "MipNeRF-360 analog)",
    }
    for k in ("lpips", "lpips_proxy", "lpips_note"):
        if k in val:
            entry[k] = val[k]
    print(f"[3/3] cap {args.cap}: {json.dumps(entry)}")

    if args.json:
        table = {}
        if os.path.exists(args.json):
            table = json.load(open(args.json))
        table[str(args.cap)] = entry
        with open(args.json, "w") as f:
            json.dump(table, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
