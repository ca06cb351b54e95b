"""3DGS training CLI (reference: examples/simple_trainer.py tyro CLI with
default/mcmc presets; tyro is unavailable in this image so this is argparse
over tdgs.training.Config — every flag keeps its reference name).

    python examples/simple_trainer.py mcmc --data-dir data/360_v2/garden \\
        --data-factor 4 --result-dir results/garden
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdgs.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORM_NAME even if the plugin ignores it

from tdgs.strategy import DefaultStrategy, MCMCStrategy
from tdgs.training.config import Config
from tdgs.training.trainer import Runner


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("preset", choices=["default", "mcmc"], nargs="?",
                    default="default")
    for f in dataclasses.fields(Config):
        if f.name == "strategy":
            continue
        arg = "--" + f.name.replace("_", "-")
        if f.name == "background_color":
            # "r,g,b" or a single gray value → 3-tuple
            ap.add_argument(
                arg,
                type=lambda s: tuple(
                    (lambda v: v * 3 if len(v) == 1 else v)(
                        [float(x) for x in s.split(",")]
                    )
                ),
                default=None, dest=f.name,
                help="constant compositing background, e.g. 0.78 or "
                "0.2,0.5,0.9",
            )
            continue
        if f.type == "bool" or isinstance(f.default, bool):
            # --flag / --no-flag; None = keep the Config default
            ap.add_argument(arg, action=argparse.BooleanOptionalAction,
                            default=None, dest=f.name)
        elif isinstance(f.default, (int, float, str)) or f.default is None:
            if f.default is not None:
                t = type(f.default)
            else:
                # Optional[...] fields: parse by the annotation's inner type
                ann = str(f.type)
                t = int if "int" in ann else float if "float" in ann else str
            ap.add_argument(arg, type=t, default=None, dest=f.name)
        # list fields: comma separated
        elif isinstance(f.default_factory(), list) if f.default_factory is not dataclasses.MISSING else False:
            ap.add_argument(arg, type=str, default=None, dest=f.name)
    ap.add_argument("--cap-max", type=int, default=1_000_000)
    ap.add_argument("--absgrad", action="store_true",
                    help="AbsGS absolute screen-gradient densification "
                    "(DefaultStrategy only; reference --strategy.absgrad)")
    ap.add_argument("--grow-grad2d", type=float, default=None,
                    help="densify threshold (reference suggests 0.0008 "
                    "with --absgrad)")
    ap.add_argument("--ckpt", type=str, default=None,
                    help="checkpoint to load for eval-only")
    return ap


def main(parser=None):
    ap = parser if parser is not None else build_parser()
    args = ap.parse_args()

    if args.preset == "mcmc":
        # reference mcmc preset (simple_trainer.py:1597-1618): MCMC strategy,
        # opacity/scale regularizers, lower init opacity
        strategy = MCMCStrategy(cap_max=args.cap_max)
        overrides = dict(init_opa=0.5, init_scale=0.1,
                         opacity_reg=0.01, scale_reg=0.01)
    else:
        strategy = DefaultStrategy(verbose=True, absgrad=args.absgrad)
        if args.grow_grad2d is not None:
            strategy.grow_grad2d = args.grow_grad2d
        elif args.absgrad:
            strategy.grow_grad2d = 0.0008  # reference absgrad default
        overrides = {}

    cfg_kwargs = dict(overrides)
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name, None)
        if v is None or f.name == "strategy":
            continue
        is_list_field = (
            f.default_factory is not dataclasses.MISSING
            and isinstance(f.default_factory(), list)
        )
        if isinstance(v, str) and is_list_field:
            v = [int(x) for x in v.split(",")]
        cfg_kwargs[f.name] = v
    cfg = Config(strategy=strategy, **cfg_kwargs)

    runner = Runner(cfg)
    if args.ckpt:
        step = runner.load_checkpoint(args.ckpt)
        stats = runner.eval(step)
        print(json.dumps(stats))
        return
    out = runner.train()
    print(json.dumps(out["history"][-3:]))
    stats = runner.eval(cfg.max_steps)
    print(json.dumps(stats))
    if cfg.compression:
        # post-training compression round-trip + eval
        # (reference --compression png → run_compression)
        print(json.dumps(runner.run_compression(cfg.max_steps)))
    if not cfg.disable_video:
        # camera-trajectory video (reference render_traj at train end)
        print(runner.render_traj(
            cfg.max_steps, traj_path=cfg.render_traj_path
        ))
    if runner.viewer is not None:
        # keep the live viewer up after training (reference
        # simple_trainer.py:1646-1650 "Ctrl+C to exit")
        print(f"viewer still running at http://localhost:{cfg.viewer_port} "
              "— Ctrl+C to exit")
        import time

        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass


if __name__ == "__main__":
    main()
