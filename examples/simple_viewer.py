"""Interactive viewer CLI (reference: examples/simple_viewer.py).

Loads a PLY (or generates the synthetic test scene) and serves the
self-contained HTTP viewer. Doubles as a multi-device rendering smoke test
with --distributed (the reference's simple_viewer is the 2-rank smoke test,
simple_viewer.py:21-80).

    python examples/simple_viewer.py --ply scene.ply --port 8080
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORM_NAME even if the plugin ignores it

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ply", default=None)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--scene-grid", type=int, default=1,
                    help="synthetic scene replication when no --ply")
    ap.add_argument("--distributed", action="store_true",
                    help="render through the sharded multi-device path")
    ap.add_argument("--model-type", choices=["3dgs", "2dgs", "3dgut"],
                    default="3dgs",
                    help="render family (reference simple_viewer.py / "
                    "simple_viewer_2dgs.py / simple_viewer_3dgut.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tdgs.viewer import ViewerServer
    from tdgs.viewer.server import make_splat_render_fn

    if args.ply:
        from tdgs.pipeline import GaussianModel

        model = GaussianModel()
        splats = model.load_splats_from_ply(args.ply)
        target = np.asarray(splats["means"]).mean(0)
    else:
        from tdgs.models.gaussians import rgb_to_sh
        from tdgs.utils.test_data import load_test_data

        (means, quats, scales, opacities, colors, viewmats, Ks, w, h) = (
            load_test_data(scene_grid=args.scene_grid)
        )
        n = means.shape[0]
        splats = {
            "means": jnp.asarray(means),
            "quats": jnp.asarray(quats),
            "scales": jnp.asarray(np.log(scales)),
            "opacities": jnp.asarray(
                np.log(opacities / (1 - np.clip(opacities, 1e-4, 1 - 1e-4)))
            ),
            "sh0": jnp.asarray(rgb_to_sh(colors))[:, None, :],
            "shN": jnp.zeros((n, 15, 3)),
        }
        target = means.mean(0)

    if args.distributed:
        # sharded smoke render before serving (reference simple_viewer:38-78)
        from tdgs.parallel import make_mesh, rasterization_sharded

        mesh = make_mesh()
        D = len(jax.devices())
        n = splats["means"].shape[0] // D * D
        sh = jnp.concatenate([splats["sh0"], splats["shN"]], -2)[:n]
        vm = np.tile(np.eye(4, dtype=np.float32), (D, 1, 1))
        K = np.tile(
            np.array([[500.0, 0, 480], [0, 500, 270], [0, 0, 1]], np.float32),
            (D, 1, 1),
        )
        img, alpha, _ = rasterization_sharded(
            splats["means"][:n], splats["quats"][:n],
            jnp.exp(splats["scales"][:n]),
            jax.nn.sigmoid(splats["opacities"][:n]), sh, jnp.asarray(vm),
            jnp.asarray(K), 960, 540, mesh, sh_degree=3,
        )
        print(f"distributed smoke render OK over {D} devices:", img.shape)

    render_fn = make_splat_render_fn(splats, model_type=args.model_type)
    viewer = ViewerServer(
        render_fn, width=args.width, height=args.height, port=args.port,
        target=target,
    )
    viewer.serve_forever()


if __name__ == "__main__":
    main()
