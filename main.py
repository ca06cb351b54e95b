"""Domino-rally pipeline driver: PLY + cluster groups → physics → video.

TPU-native counterpart of the reference's root main.py (:231-409), which
loads a trained PLY and cluster_groups.npz, selects clusters, and renders —
its kinematic animation loop is commented out and it has no physics. Here
the full pipeline runs: rigid bodies are extracted from the clustered
splats, simulated with the pure-JAX engine, and rendered through the fused
step/render jit loop.

    # single-frame render of one cluster (the reference's behavior)
    python main.py --ply scene.ply --clusters cluster_groups.npz \\
        --select 1 --out frame.png

    # full rally: simulate + render video
    python main.py --ply scene.ply --clusters cluster_groups.npz \\
        --simulate --frames 120 --push 0:4.0 --out rally.mp4
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORM_NAME even if the plugin ignores it

import numpy as np


def default_camera(means: np.ndarray, width: int, height: int):
    center = means.mean(axis=0)
    extent = float(np.linalg.norm(means - center, axis=1).max())
    viewmat = np.eye(4, dtype=np.float32)
    viewmat[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    cam_pos = center + np.array([0.0, -3.0 * extent, 0.6 * extent])
    viewmat[:3, 3] = -(viewmat[:3, :3] @ cam_pos)
    f = 1.2 * max(width, height)
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32)
    return viewmat, K


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ply", required=True)
    ap.add_argument("--clusters", default=None, help="cluster_groups.npz")
    ap.add_argument("--select", default=None,
                    help="cluster key to render alone (reference behavior)")
    ap.add_argument("--simulate", action="store_true")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--physics-hz", type=int, default=240)
    ap.add_argument("--push", default=None,
                    help="body_index:angular_velocity to topple (e.g. 0:4.0)")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--background", type=float, default=None,
                    help="constant gray compositing background (e.g. 0.78)")
    ap.add_argument("--exact-tiles", action="store_true",
                    help="exact tile coverage (no per-gaussian cap) — use "
                    "for trained scenes with large splats")
    ap.add_argument("--out", default="out.png")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tdgs.pipeline import GaussianModel, render_splats
    from tdgs.segmentation.clustering import load_cluster_groups

    model = GaussianModel(sh_degree=args.sh_degree)
    splats = model.load_splats_from_ply(args.ply)
    n = splats["means"].shape[0]
    print(f"loaded {n} splats from {args.ply}")

    groups = None
    if args.clusters:
        groups = load_cluster_groups(args.clusters)
        print("clusters:", {k: len(v) for k, v in groups.items()})

    if args.select is not None:
        # single-cluster render (reference main.py:293-344)
        idx = groups[str(args.select)]
        sub = model.select(idx)
        viewmat, K = default_camera(np.asarray(sub["means"]), args.width, args.height)
        img, _ = render_splats(sub, viewmat, K, args.width, args.height,
                               sh_degree=args.sh_degree)
        from PIL import Image

        Image.fromarray(
            (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        ).save(args.out)
        print(f"saved {args.out}")
        return

    if not args.simulate:
        viewmat, K = default_camera(np.asarray(splats["means"]), args.width,
                                    args.height)
        img, _ = render_splats(splats, viewmat, K, args.width, args.height,
                               sh_degree=args.sh_degree)
        from PIL import Image

        Image.fromarray(
            (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        ).save(args.out)
        print(f"saved {args.out}")
        return

    # ---- full rally: physics + fused step/render ----
    from tdgs.physics import (
        PhysicsParams,
        extract_bodies_from_splats,
        make_step_and_render,
    )
    from tdgs.physics.bodies import initial_state
    from tdgs.physics.splat_binding import labels_to_body_ids
    from tdgs.rendering import rasterization

    assert groups is not None, "--simulate requires --clusters"
    labels = np.full(n, -1, np.int32)
    for k, idx in groups.items():
        if k == "background":
            continue
        labels[idx] = int(k)

    means = np.asarray(splats["means"])
    quats = np.asarray(splats["quats"])
    scales = np.exp(np.asarray(splats["scales"]))
    opac = 1.0 / (1.0 + np.exp(-np.asarray(splats["opacities"])))
    bodies, body_groups = extract_bodies_from_splats(
        means, quats, scales, opac, labels
    )
    from tdgs.physics.bodies import settle_on_ground

    bodies = settle_on_ground(bodies)
    body_ids = jnp.asarray(labels_to_body_ids(labels, body_groups))
    print(f"extracted {bodies.mass.shape[0]} rigid bodies")

    viewmat, K = default_camera(means, args.width, args.height)
    sh = jnp.concatenate([splats["sh0"], splats["shN"]], axis=-2)
    rasterizer = (
        "packed_inference" if jax.default_backend() == "tpu" else "jax"
    )

    def render_fn(m, q):
        img, alpha, _ = rasterization(
            m, q, jnp.exp(splats["scales"]),
            jax.nn.sigmoid(splats["opacities"]), sh,
            jnp.asarray(viewmat)[None], jnp.asarray(K)[None],
            args.width, args.height, sh_degree=args.sh_degree,
            rasterizer=rasterizer, isect_exact=args.exact_tiles,
            backgrounds=(jnp.full((1, 3), args.background)
                         if args.background is not None else None),
        )
        return img, alpha

    substeps = max(args.physics_hz // args.fps, 1)
    step_and_render = make_step_and_render(
        {"means": splats["means"], "quats": splats["quats"]},
        body_ids, bodies, render_fn,
        params=PhysicsParams(dt=1.0 / args.physics_hz), substeps=substeps,
    )
    state = initial_state(bodies)
    if args.push:
        bi, w = args.push.split(":")
        state = state._replace(
            w=state.w.at[int(bi), 1].set(float(w))
        )

    frames = []
    for f in range(args.frames):
        state, img, alpha = step_and_render(state)
        frames.append(
            (np.clip(np.asarray(img[0]), 0, 1) * 255).astype(np.uint8)
        )
        if f % 10 == 0:
            print(f"frame {f}/{args.frames}")

    if args.out.endswith(".mp4"):
        try:
            import imageio

            imageio.mimwrite(args.out, frames, fps=args.fps)
        except (ImportError, ValueError):
            # no ffmpeg backend in this image — fall back to animated GIF
            from PIL import Image

            args.out = args.out[:-4] + ".gif"
            imgs = [Image.fromarray(fr) for fr in frames]
            imgs[0].save(
                args.out, save_all=True, append_images=imgs[1:],
                duration=int(1000 / args.fps), loop=0,
            )
    elif args.out.endswith(".gif"):
        from PIL import Image

        imgs = [Image.fromarray(fr) for fr in frames]
        imgs[0].save(
            args.out, save_all=True, append_images=imgs[1:],
            duration=int(1000 / args.fps), loop=0,
        )
    else:
        from PIL import Image

        for i, fr in enumerate(frames):
            Image.fromarray(fr).save(args.out.replace(".png", f"_{i:04d}.png"))
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
