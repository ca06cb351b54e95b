"""Fit N random 2D-ish gaussians to a single image — the end-to-end smoke.

TPU-native counterpart of the reference's examples/image_fitting.py
(SimpleTrainer: fixed identity camera, N random gaussians, Adam on
means/scales/quats/colors/opacities against an MSE loss). The whole train
step (render + loss + grad + optimizer update) is one jit-compiled function.

Run: python examples/image_fitting.py --height 128 --width 128 --num-points 2000
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORM_NAME even if the plugin ignores it

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tdgs.rendering import rasterization


def make_target_image(height: int, width: int) -> np.ndarray:
    """Synthetic target: left half red→blue gradient, right half green rings
    (roughly the reference's two-color synthetic image, but richer)."""
    y, x = np.mgrid[0:height, 0:width].astype(np.float32)
    img = np.zeros((height, width, 3), np.float32)
    img[..., 0] = x / width
    img[..., 2] = y / height
    r = np.sqrt((x - width / 2) ** 2 + (y - height / 2) ** 2)
    img[..., 1] = 0.5 + 0.5 * np.cos(r / 6.0)
    return np.clip(img, 0.0, 1.0)


def init_params(key: jax.Array, num_points: int, extent: float = 2.0):
    ks = jax.random.split(key, 5)
    return {
        "means": jax.random.uniform(ks[0], (num_points, 3), minval=-extent,
                                    maxval=extent) * jnp.array([1.0, 1.0, 0.0])
        + jnp.array([0.0, 0.0, 8.0]),
        "scales": jnp.log(jax.random.uniform(ks[1], (num_points, 3),
                                             minval=0.05, maxval=0.25)),
        "quats": jax.random.normal(ks[2], (num_points, 4)) * 0.1
        + jnp.array([1.0, 0, 0, 0]),
        "opacities": jnp.full((num_points,), 0.5),
        "colors": jax.random.uniform(ks[3], (num_points, 3)),
    }


def build_camera(height: int, width: int):
    f = 1.2 * max(height, width)
    viewmats = jnp.eye(4)[None]
    Ks = jnp.array([[[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]]])
    return viewmats, Ks


def fit(
    height: int = 128,
    width: int = 128,
    num_points: int = 2000,
    iterations: int = 1000,
    lr: float = 1e-2,
    seed: int = 42,
    rasterizer: str = "jax",
    log_every: int = 100,
    model_type: str = "3dgs",
) -> Tuple[float, float, np.ndarray]:
    """Returns (initial_loss, final_loss, final_render)."""
    target = jnp.asarray(make_target_image(height, width))
    key = jax.random.PRNGKey(seed)
    params = init_params(key, num_points)
    viewmats, Ks = build_camera(height, width)

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def render(params):
        if model_type == "2dgs":
            # surfel variant (reference image_fitting.py model_type switch)
            from tdgs.rendering import rasterization_2dgs

            out = rasterization_2dgs(
                params["means"], params["quats"], jnp.exp(params["scales"]),
                jax.nn.sigmoid(params["opacities"]),
                jax.nn.sigmoid(params["colors"]), viewmats, Ks, width, height,
                tile_capacity=512, isect_capacity=None,
                max_tiles_per_gauss=64,
            )
            return out[0][0]
        img, alpha, _ = rasterization(
            params["means"],
            params["quats"],
            jnp.exp(params["scales"]),
            jax.nn.sigmoid(params["opacities"]),
            jax.nn.sigmoid(params["colors"]),
            viewmats,
            Ks,
            width,
            height,
            rasterizer=rasterizer,
            tile_capacity=512,
            max_tiles_per_gauss=64,
        )
        return img[0]

    def loss_fn(params):
        return jnp.mean((render(params) - target) ** 2)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    initial_loss = float(loss_fn(params))
    t0 = time.time()
    for it in range(iterations):
        params, opt_state, loss = step(params, opt_state)
        if log_every and (it % log_every == 0 or it == iterations - 1):
            print(f"iter {it:5d} loss {float(loss):.6f}")
    jax.block_until_ready(params)
    dt = time.time() - t0
    final_loss = float(loss_fn(params))
    print(
        f"initial {initial_loss:.6f} -> final {final_loss:.6f} "
        f"({iterations} iters, {dt:.1f}s, {iterations / dt:.1f} it/s)"
    )
    return initial_loss, final_loss, np.asarray(render(params))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--num-points", type=int, default=2000)
    ap.add_argument("--iterations", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--rasterizer", default="jax",
                    choices=["jax", "pallas", "packed", "packed_inference"])
    ap.add_argument("--model-type", default="3dgs", choices=["3dgs", "2dgs"])
    ap.add_argument("--save", default=None, help="save final render PNG here")
    args = ap.parse_args()
    _, _, img = fit(
        args.height, args.width, args.num_points, args.iterations,
        lr=args.lr, rasterizer=args.rasterizer, model_type=args.model_type,
    )
    if args.save:
        from PIL import Image

        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(args.save)
        print("saved", args.save)


if __name__ == "__main__":
    main()
