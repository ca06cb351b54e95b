"""Diagnose the rally's step-500 stall: AOT-compile the trainer's
(seg=True, spatial=True) train-step variant at the exact rally shapes,
with progress prints, so a hang/OOM surfaces interactively instead of
inside a 40-minute background run.

    python tools/probe_seg_compile.py --capacity 64000 --width 640 \
        --height 480 [--no-spatial] [--no-seg]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=64000)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--n-images", type=int, default=4)
    ap.add_argument("--no-spatial", action="store_true")
    ap.add_argument("--no-seg", action="store_true")
    ap.add_argument("--run", action="store_true", help="also execute one step")
    ap.add_argument("--sh-degree", type=int, default=0,
                    help="static sh_degree of the variant (rally step 500: 0)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from tdgs.strategy import MCMCStrategy
    from tdgs.training.config import Config
    from tdgs.training.trainer import Runner
    from tdgs.utils.test_data import DOMINO_BACKGROUND, make_domino_scene

    data_dir = "/tmp/probe_seg_data"
    if not os.path.isdir(os.path.join(data_dir, "sparse")):
        print("generating tiny probe dataset", flush=True)
        make_domino_scene(
            data_dir, n_dominoes=2, n_images=args.n_images,
            width=args.width, height=args.height,
            gauss_per_domino=200, ground_gauss=400, sfm_points=500,
        )

    cfg = Config(
        data_dir=data_dir,
        data_factor=1,
        result_dir="/tmp/probe_seg_out",
        normalize_world_space=False,
        max_steps=10,
        eval_steps=[],
        save_steps=[],
        ply_steps=[],
        init_type="sfm",
        init_opa=0.5,
        init_scale=0.1,
        opacity_reg=0.01,
        scale_reg=0.01,
        background_color=(DOMINO_BACKGROUND,) * 3,
        max_scale=0.15,
        sh_degree=3,
        strategy=MCMCStrategy(cap_max=args.capacity),
        capacity=args.capacity,
        with_segmentation=True,
        identity_dim=16,
    )
    t0 = time.time()
    print(f"[{time.time()-t0:6.1f}s] building Runner "
          f"(capacity {args.capacity}, {args.width}x{args.height}) "
          f"on {jax.default_backend()}", flush=True)
    runner = Runner(cfg)

    d = runner.trainset[0]
    batch = {
        "image": jnp.asarray(d["image"])[None],
        "viewmat": jnp.asarray(d["viewmat"])[None],
        "K": jnp.asarray(d["K"])[None],
        "image_id": jnp.zeros((1,), jnp.int32),
        "instance_mask": jnp.asarray(
            np.asarray(d["instance_mask"], np.int32)
        )[None],
    }
    lr_dict = {
        k: jnp.float32(v) for k, v in runner.optimizer.lr_at(1).items()
        if k in runner.splats
    }
    for k, lr in runner.aux_lrs.items():
        lr_dict[f"aux_{k}"] = jnp.float32(lr)
    key = jax.random.PRNGKey(0)

    seg_kwargs = dict(
        sh_degree=args.sh_degree,
        use_seg_loss=not args.no_seg, use_spatial_reg=not args.no_spatial,
    )
    print(f"[{time.time()-t0:6.1f}s] lowering seg step {seg_kwargs}",
          flush=True)
    seg_lowered = runner._seg_step.lower(
        runner.splats, runner.seg_head, runner.seg_opt_state,
        batch, key, **seg_kwargs,
    )
    print(f"[{time.time()-t0:6.1f}s] lowered; compiling seg step...",
          flush=True)
    seg_compiled = seg_lowered.compile()
    print(f"[{time.time()-t0:6.1f}s] SEG STEP COMPILED OK", flush=True)

    print(f"[{time.time()-t0:6.1f}s] lowering main step (with extra "
          f"grads input)", flush=True)
    extra = jax.tree.map(jnp.zeros_like, runner.splats)
    lowered = runner._train_step.lower(
        runner.splats, runner.opt_state, runner.seg_head,
        runner.seg_opt_state, runner.aux_params, runner.aux_opt_state,
        batch, lr_dict, key, extra,
        sh_degree=args.sh_degree, use_means2d_tap=False, use_absgrad=False,
    )
    print(f"[{time.time()-t0:6.1f}s] lowered; compiling main step...",
          flush=True)
    compiled = lowered.compile()
    print(f"[{time.time()-t0:6.1f}s] MAIN STEP COMPILED OK", flush=True)
    if args.run:
        print(f"[{time.time()-t0:6.1f}s] executing seg + main step",
              flush=True)
        g_extra, head, seg_opt, terms, cq = seg_compiled(
            runner.splats, runner.seg_head, runner.seg_opt_state,
            batch, key,
        )
        out = compiled(
            runner.splats, runner.opt_state, head, seg_opt,
            runner.aux_params, runner.aux_opt_state,
            batch, lr_dict, key, g_extra,
        )
        loss = out[6]
        terms = {k: float(np.asarray(v)) for k, v in terms.items()}
        print(f"[{time.time()-t0:6.1f}s] ran: main loss="
              f"{float(np.asarray(loss)):.4f} seg terms={terms}", flush=True)


if __name__ == "__main__":
    main()
