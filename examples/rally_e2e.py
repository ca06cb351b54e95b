"""End-to-end domino rally on TPU — the reference README's full workflow
(README.md:11-45) as ONE command, including the physics stage the reference
only describes:

  procedural multi-view domino dataset (COLMAP + instance masks)
    → 3DGS training with identity-vector segmentation
    → K-means clustering of identity encodings (anchor-initialized)
    → PLY export/import round trip (main.py path)
    → rigid-body extraction + settle + push
    → fused physics-step/render rally loop, saved as a GIF

and records the north-star numbers (BASELINE.json: ≥30 fps 1080p dynamic
render, ≥240 Hz physics, frames matching at PSNR ≥ 40) in a JSON artifact:

    python examples/rally_e2e.py --steps 2000 --json RALLY_r02.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORM_NAME even if the plugin ignores it

import numpy as np


def psnr_np(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default="data/domino_synth")
    ap.add_argument("--out-dir", default="results/rally_e2e")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--n-dominoes", type=int, default=6)
    ap.add_argument("--capacity", type=int, default=24_000)
    ap.add_argument("--n-images", type=int, default=32,
                    help="dataset views (bigger scenes need more)")
    ap.add_argument("--gauss-per-domino", type=int, default=700)
    ap.add_argument("--ground-gauss", type=int, default=2500)
    ap.add_argument("--data-width", type=int, default=480,
                    help="dataset image width (bigger rows need more px)")
    ap.add_argument("--data-height", type=int, default=360)
    ap.add_argument("--sfm-points", type=int, default=4000,
                    help="SFM seed points (sets the MCMC starting count)")
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--physics-hz", type=int, default=240)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--push", type=float, default=5.0,
                    help="initial angular velocity (rad/s) on domino 0")
    ap.add_argument("--json", default=None,
                    help="write the summary JSON here (e.g. RALLY_r02.json)")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse the checkpoint in --out-dir")
    ap.add_argument("--ckpt-every", type=int, default=500,
                    help="mid-run checkpoint cadence; a crashed/killed run "
                    "resumes from the newest ckpt automatically")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # persistent compile cache: a resumed run (after a tunnel death)
    # replays the same shapes and skips the multi-minute recompiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from tdgs.strategy import MCMCStrategy
    from tdgs.training.config import Config
    from tdgs.training.trainer import Runner
    from tdgs.utils.test_data import DOMINO_BACKGROUND, make_domino_scene

    t_wall0 = time.time()
    summary = {"steps": args.steps, "n_dominoes": args.n_dominoes}

    # ---- 1. dataset (procedural stand-in for the captured domino scene) ----
    if not os.path.isdir(os.path.join(args.data_dir, "sparse")):
        print(f"[1/5] generating domino dataset at {args.data_dir}")
        make_domino_scene(
            args.data_dir, n_dominoes=args.n_dominoes,
            n_images=args.n_images,
            width=args.data_width, height=args.data_height,
            gauss_per_domino=args.gauss_per_domino,
            ground_gauss=args.ground_gauss,
            sfm_points=args.sfm_points,
        )
    else:
        print(f"[1/5] dataset exists at {args.data_dir}")

    # ---- 2. train with segmentation ----
    steps = args.steps
    cfg = Config(
        data_dir=args.data_dir,
        data_factor=1,
        result_dir=args.out_dir,
        normalize_world_space=False,  # keep the physics frame (z-up, ground z=0)
        max_steps=steps,
        eval_steps=[steps],
        # mid-run checkpoints so a dead TPU tunnel costs minutes, not the
        # whole run (the round-4 rally attempt died at train step 400 with
        # nothing on disk)
        save_steps=sorted(
            set(range(args.ckpt_every, steps, args.ckpt_every)) | {steps}
        ),
        ply_steps=[],
        init_type="sfm",
        # the reference's mcmc preset hypers (simple_trainer.py:1597-1618):
        # opacity/scale regularizers keep the MCMC dynamics stable
        init_opa=0.5,
        init_scale=0.1,
        opacity_reg=0.01,
        scale_reg=0.01,
        # composite onto the dataset's flat backdrop — otherwise the model
        # fabricates giant gray splats to explain the background, which
        # blow up projected radii and wreck both quality and fps
        background_color=(DOMINO_BACKGROUND,) * 3,
        # GT splats are ≤0.1 world units; a ceiling modestly above that
        # keeps the projected footprints (and so the per-frame tile
        # working set) bounded without limiting expressiveness — at 0.25
        # the trained ground splats ballooned to ~500 px radii and the
        # 1080p rally demanded 2.2M tile-intersections per frame
        max_scale=0.15,
        sh_degree=3,
        sh_degree_interval=max(steps // 4, 1),
        strategy=MCMCStrategy(
            cap_max=args.capacity,
            refine_start_iter=min(300, steps // 4),
            refine_stop_iter=max(steps - 200, 1),
            refine_every=100,
        ),
        capacity=args.capacity,
        with_segmentation=True,
        identity_dim=16,
        seg_start_iter=min(500, steps // 3),
        seg_loss_every=10,
        seg_spatial_every=100,
        tb_every=100,
    )
    ckpt_path = os.path.join(args.out_dir, "ckpts", f"ckpt_{steps}.pkl")
    runner = Runner(cfg)
    # resume from the newest mid-run checkpoint if one exists
    import glob as _glob
    have = sorted(
        (int(os.path.basename(p)[5:-4]), p)
        for p in _glob.glob(os.path.join(args.out_dir, "ckpts", "ckpt_*.pkl"))
    )
    if args.skip_train and os.path.exists(ckpt_path):
        print(f"[2/5] loading checkpoint {ckpt_path}")
        runner.load_checkpoint(ckpt_path)
        val = runner.eval(steps)
    else:
        start = 0
        if have:
            start, newest = have[-1]
            print(f"[2/5] resuming from {newest} (step {start})")
            runner.load_checkpoint(newest)
        if start >= steps:
            val = runner.eval(steps)
        else:
            print(f"[2/5] training steps {start + 1}..{steps} "
                  f"on {jax.default_backend()}")
            runner.train(start_step=start)
            with open(os.path.join(args.out_dir, "stats",
                                   f"val_step{steps}.json")) as f:
                val = json.load(f)
    print(f"      val PSNR {val['psnr']:.2f}  SSIM {val['ssim']:.3f}  "
          f"num_GS {val['num_GS']}")
    summary["train_psnr"] = val["psnr"]
    summary["train_ssim"] = val["ssim"]
    summary["num_gaussians"] = val["num_GS"]

    # ---- 3. cluster identity encodings (anchor K-means + bg outliers) ----
    print("[3/5] clustering identity encodings")
    from tdgs.segmentation import (
        apply_segmentation_head,
        kmeans_identity_encodings_background,
    )
    from tdgs.segmentation.clustering import (
        load_cluster_groups,
        save_cluster_groups,
    )

    # multi-view anchors: a single view can occlude rear dominoes (the
    # orbit's head-on frames see a stacked row), starving their anchor of
    # pixels and merging clusters. Concatenating several spread views'
    # identity maps + masks row-wise gives every instance well-seen pixels.
    n_views = len(runner.trainset)
    view_ids = sorted({0, n_views // 4, n_views // 2, 3 * n_views // 4})
    maps, masks = [], []
    for v in view_ids:
        maps.append(runner.render_identity_map(v))
        masks.append(np.asarray(runner.trainset[v]["instance_mask"]))
    identity_map = np.concatenate(maps, axis=0)
    instance_mask = np.concatenate(masks, axis=0)
    d = runner.trainset[0]
    feats = np.asarray(
        apply_segmentation_head(
            runner.seg_head, runner.splats["identity_encodings"]
        )
    )
    res = kmeans_identity_encodings_background(
        identity_map, instance_mask, feats
    )
    # dead MCMC rows (opacity ~ 0) carry no geometry — keep them out of the
    # rigid bodies regardless of which centroid their encoding landed on
    opac = np.asarray(jax.nn.sigmoid(runner.splats["opacities"]))
    labels = res["labels"].copy()
    labels[opac < 0.05] = -1
    res["labels"] = labels
    clusters_path = os.path.join(args.out_dir, "cluster_groups.npz")
    save_cluster_groups(clusters_path, res)
    n_found = len([k for k in np.unique(labels) if k >= 0])
    print(f"      {n_found} clusters (expected {args.n_dominoes}); "
          f"{(labels < 0).mean() * 100:.1f}% background")
    summary["clusters_found"] = n_found
    summary["clusters_expected"] = args.n_dominoes

    # ---- 4. PLY round trip (the reference main.py load path) ----
    print("[4/5] PLY export/import round trip")
    from tdgs.pipeline import GaussianModel
    from tdgs.utils.ply import save_ply

    ply_path = os.path.join(args.out_dir, "scene.ply")
    sp = {k: np.asarray(v) for k, v in runner.splats.items()}
    save_ply(ply_path, sp["means"], sp["scales"], sp["quats"],
             sp["opacities"], sp["sh0"], sp["shN"])
    model = GaussianModel(sh_degree=cfg.sh_degree)
    splats = model.load_splats_from_ply(ply_path)
    groups = load_cluster_groups(clusters_path)

    # ---- 5. rally: bodies + fused step/render ----
    print("[5/5] rigid-body rally")
    from tdgs.physics import (
        PhysicsParams,
        extract_bodies_from_splats,
        make_step_and_render,
    )
    from tdgs.physics.bodies import initial_state, settle_on_ground
    from tdgs.physics.splat_binding import labels_to_body_ids
    from tdgs.rendering import rasterization

    n = splats["means"].shape[0]
    lab = np.full(n, -1, np.int32)
    for k, idx in groups.items():
        if k != "background":
            lab[idx] = int(k)
    means_np = np.asarray(splats["means"])
    bodies, body_groups = extract_bodies_from_splats(
        means_np, np.asarray(splats["quats"]),
        np.exp(np.asarray(splats["scales"])),
        1.0 / (1.0 + np.exp(-np.asarray(splats["opacities"]))), lab,
    )
    bodies = settle_on_ground(bodies)
    body_ids = jnp.asarray(labels_to_body_ids(lab, body_groups))
    n_bodies = int(bodies.mass.shape[0])
    print(f"      {n_bodies} rigid bodies")
    summary["n_bodies"] = n_bodies

    # camera: reuse a train view, scaled to the rally resolution
    W, H = args.width, args.height
    src_h, src_w = d["image"].shape[:2]
    K = np.asarray(d["K"]).copy()
    K[0] *= W / src_w
    K[1] *= H / src_h
    viewmat = np.asarray(d["viewmat"])
    sh = jnp.concatenate([splats["sh0"], splats["shN"]], axis=-2)
    rasterizer = (
        "packed_inference" if jax.default_backend() == "tpu" else "jax"
    )

    bkgd = jnp.full((1, 3), DOMINO_BACKGROUND)

    # expansion plan from the trained scene's footprint histogram
    # (derive_isect_plan); +30% capacity headroom covers frame-to-frame
    # variation as bodies move. Trained domino scenes carry a few HUGE
    # ground splats (footprint_kmax into the hundreds of tiles): any
    # capped plan clips their coverage (first-K-tiles banding — measured
    # 66 -> 27 dB against the reference chain), so whenever kmax exceeds
    # the cap we use exact coverage instead (the [G]-row scatter is cheap
    # at this N; it only dominates past ~500k gaussians)
    from tdgs.ops.tiling import derive_isect_plan
    plan = derive_isect_plan(
        splats["means"], splats["quats"], jnp.exp(splats["scales"]),
        jax.nn.sigmoid(splats["opacities"]),
        jnp.asarray(viewmat)[None], jnp.asarray(K)[None], W, H,
        headroom=1.3, max_tiles_per_gauss=64,
    )
    print(f"      isect plan {plan}")
    full_demand = plan.pop("full_isect_demand")
    if plan.pop("footprint_kmax") > plan["max_tiles_per_gauss"]:
        plan = {
            "isect_capacity": -(-int(full_demand * 1.3) // 4096) * 4096,
            "isect_exact": True,
        }
        print(f"      kmax exceeds cap → exact coverage, "
              f"capacity {plan['isect_capacity']}")
    isect_cap = plan["isect_capacity"]

    def render_fn(m, q):
        img, alpha, _ = rasterization(
            m, q, jnp.exp(splats["scales"]),
            jax.nn.sigmoid(splats["opacities"]), sh,
            jnp.asarray(viewmat)[None], jnp.asarray(K)[None],
            W, H, sh_degree=cfg.sh_degree, rasterizer=rasterizer,
            backgrounds=bkgd, tile_capacity=2048, **plan,
        )
        return img, alpha

    substeps = max(args.physics_hz // args.fps, 1)
    step_and_render = make_step_and_render(
        {"means": splats["means"], "quats": splats["quats"]},
        body_ids, bodies, render_fn,
        params=PhysicsParams(dt=1.0 / args.physics_hz), substeps=substeps,
    )
    state0 = initial_state(bodies)
    # order bodies along the row: push the body with the smallest COM x
    first = int(np.argmin(np.asarray(bodies.com0)[:, 0]))
    state = state0._replace(w=state0.w.at[first, 1].set(args.push))

    # golden check (north-star "matching frames at PSNR ≥ 40"): the
    # pre-push frame through the production kernel vs an independent
    # float64 numpy re-composition of the SAME projected stream
    # (tdgs/utils/golden.py — a viewport-cropped jnp-oracle re-render is
    # NOT a valid reference: EWA clamps (tx, ty) to viewport-dependent
    # frustum limits, so stripes linearize big splats differently;
    # projection itself is covered by tests/test_reference_parity.py)
    from tdgs.ops.sh import spherical_harmonics
    from tdgs.utils.golden import compose_reference_f64

    # golden frame rendered with the SAME expansion plan the rollout uses
    # (exact_depth orders entries like the f64 oracle's full-depth sort)
    img_fast, _, gmeta = rasterization(
        splats["means"], splats["quats"], jnp.exp(splats["scales"]),
        jax.nn.sigmoid(splats["opacities"]), sh,
        jnp.asarray(viewmat)[None], jnp.asarray(K)[None],
        W, H, sh_degree=cfg.sh_degree, rasterizer=rasterizer,
        backgrounds=bkgd, isect_exact_depth=True,
        tile_capacity=2048, **plan,
    )
    campos = -np.asarray(viewmat)[:3, :3].T @ np.asarray(viewmat)[:3, 3]
    dirs = jnp.asarray(np.asarray(splats["means"]) - campos)
    cols = np.clip(
        np.asarray(spherical_harmonics(cfg.sh_degree, dirs, sh)) + 0.5,
        0.0, None,
    )
    img_oracle = compose_reference_f64(
        np.asarray(gmeta["isect_offsets"]),
        np.asarray(gmeta["flatten_ids"]),
        np.asarray(gmeta["means2d"]).reshape(-1, 2),
        np.asarray(gmeta["conics"]).reshape(-1, 3),
        cols,
        np.asarray(jax.nn.sigmoid(splats["opacities"])),
        W, H, gmeta["tile_size"], gmeta["tile_width"],
        gmeta["tile_height"],
        background=np.full((3,), DOMINO_BACKGROUND),
        # the jax-path meta carries [I,th,tw] per-tile starts (packed path:
        # [T+1] ranges); n_isects closes the final tile's range either way
        n_isects=int(np.asarray(gmeta["n_isects"])),
    )
    golden_psnr = psnr_np(
        np.clip(np.asarray(img_fast[0]), 0, 1),
        np.clip(img_oracle, 0, 1),
    )
    print(f"      kernel-vs-oracle PSNR {golden_psnr:.2f} dB "
          f"({W}x{H}, trained scene)")
    summary["kernel_vs_oracle_psnr"] = round(golden_psnr, 2)

    # HARDER golden: the reference torch oracle re-derives EVERY
    # intermediate independently from the trained splats — projection,
    # SH, tile intersection, offsets (_torch_impl.py:286,378,477,804) —
    # and the f64 compositor renders from those. A projection or tiling
    # bug in tdgs cannot pass this one (the check above shares gmeta).
    ref_chain_psnr = None
    try:
        from tdgs.utils.reference_oracle import (
            available as _ref_avail,
            reference_chain_render,
        )

        if _ref_avail():
            t_ref0 = time.time()
            ref_img = reference_chain_render(
                np.asarray(splats["means"]), np.asarray(splats["quats"]),
                np.exp(np.asarray(splats["scales"])),
                np.asarray(jax.nn.sigmoid(splats["opacities"])),
                np.asarray(sh), np.asarray(viewmat), np.asarray(K), W, H,
                sh_degree=cfg.sh_degree,
                background=np.full((3,), DOMINO_BACKGROUND),
            )
            ref_chain_psnr = psnr_np(
                np.clip(np.asarray(img_fast[0]), 0, 1),
                np.clip(ref_img, 0, 1),
            )
            print(f"      kernel-vs-REFERENCE-chain PSNR "
                  f"{ref_chain_psnr:.2f} dB ({W}x{H}, independent "
                  f"projection+tiling; {time.time() - t_ref0:.0f}s)")
            summary["reference_chain_psnr"] = round(ref_chain_psnr, 2)
        else:
            print("      reference chain unavailable (no torch or "
                  "reference checkout) — kernel-vs-oracle only")
    except Exception as e:  # golden must not kill the rally artifact
        summary["reference_chain_error"] = repr(e)
        print(f"      reference-chain golden failed: {e!r}")

    # fps metric: on-device rollout (lax.scan over frames, one readback at
    # the end). Pulling every 1080p f32 frame through the remote-TPU tunnel
    # costs ~33 MB/frame and would measure the tunnel, not the chip.
    def rollout(st):
        def body(s, _):
            s2, img, _ = step_and_render(s)
            return s2, img.mean()
        return jax.lax.scan(body, st, None, length=args.frames)

    roll = jax.jit(rollout)
    t_first = time.time()
    state_end, frame_means = roll(state)
    np.asarray(frame_means)  # forced host readback (block_until_ready
    # returns early through the axon tunnel)
    compile_s = time.time() - t_first
    t0 = time.time()
    state_end, frame_means = roll(state)
    np.asarray(frame_means)
    steady = time.time() - t0
    rally_fps = args.frames / steady
    # each frame runs `substeps` physics ticks
    physics_hz = rally_fps * substeps
    print(f"      rally: {rally_fps:.1f} fps @ {W}x{H} "
          f"({physics_hz:.0f} Hz physics; compile+first {compile_s:.1f}s)")

    # GIF pass (untimed): replay per frame, u8-convert on device before the
    # host pull so the tunnel moves 6 MB/frame instead of 33
    to_u8 = jax.jit(
        lambda img: (jnp.clip(img[0, ..., :3], 0, 1) * 255).astype(jnp.uint8)
    )
    frames = []
    for f in range(args.frames):
        state, img, _ = step_and_render(state)
        frames.append(np.asarray(to_u8(img)))
    summary.update({
        "rally_fps": round(rally_fps, 2),
        "rally_physics_hz": round(physics_hz, 1),
        "frames": args.frames,
        "width": W,
        "height": H,
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    })

    # sanity: the push must actually topple dominoes (positions moved)
    moved = float(np.abs(np.asarray(state.x) - np.asarray(state0.x)).max())
    summary["max_body_displacement"] = round(moved, 4)

    gif = os.path.join(args.out_dir, "rally.gif")
    from PIL import Image

    small = [Image.fromarray(fr).resize((W // 2, H // 2)) for fr in frames]
    small[0].save(gif, save_all=True, append_images=small[1:],
                  duration=int(1000 / args.fps), loop=0)
    print(f"      saved {gif}")

    summary["wall_s"] = round(time.time() - t_wall0, 1)
    summary["north_star"] = {
        "render_fps_target": 30.0,
        "render_fps_ok": rally_fps >= 30.0,
        "physics_hz_target": 240.0,
        "physics_hz_ok": physics_hz >= 240.0,
        "psnr_target": 40.0,
        "psnr_ok": golden_psnr >= 40.0 and (
            ref_chain_psnr is None or ref_chain_psnr >= 40.0
        ),
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.json}")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
