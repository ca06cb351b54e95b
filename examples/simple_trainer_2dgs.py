#!/usr/bin/env python
"""2DGS (surfel) trainer entry point — file-level parity with the
reference's examples/simple_trainer_2dgs.py (which duplicates most of
simple_trainer.py with rasterization_2dgs + normal-consistency and
distortion losses, :428, :616-637).

Here the 2DGS pipeline is a first-class branch of the one Runner
(tdgs/training/trainer.py model_type="2dgs"), so this script is the same
CLI with 2DGS defaults pinned: --model-type 2dgs, normal loss + distortion
loss on with the reference's warmup gates (normal_start_iter 7000,
dist_start_iter 3000).

    python examples/simple_trainer_2dgs.py default --data-dir <scene> ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORM_NAME even if the plugin ignores it


def main():
    import simple_trainer

    ap = simple_trainer.build_parser()
    ap.set_defaults(
        model_type="2dgs",
        normal_loss=True,
        dist_loss=True,
    )
    # reuse the shared main() with the 2DGS-pinned parser
    simple_trainer.main(parser=ap)


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
