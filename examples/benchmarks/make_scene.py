"""Generate a procedural COLMAP scene for the benchmark harness.

Used as the fallback when MipNeRF-360 data is not on disk (this image has
no network egress). Mirrors the role of the reference's
examples/datasets/download_dataset.py + data/360_v2 layout.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORM_NAME even if the plugin ignores it


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-images", type=int, default=12)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--n-pts", type=int, default=300)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from tdgs.utils.test_data import make_colmap_test_scene

    make_colmap_test_scene(
        args.out, n_images=args.n_images, width=args.width,
        height=args.height, n_pts=args.n_pts, seed=args.seed,
    )
    print(f"scene written to {args.out}")


if __name__ == "__main__":
    main()
