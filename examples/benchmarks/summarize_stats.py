"""Average per-scene eval stats into a summary + acceptance thresholds.

Mirrors the reference's examples/benchmarks/compression/summarize_stats.py
(:11-40): averages {results_dir}/{scene}/stats/{stage}_step*.json over
scenes, optionally measures the compression payload size, writes
{stage}_summary.json, and (new here) enforces --accept thresholds so CI
can gate on quality (exit code 1 on violation).

    python summarize_stats.py --results-dir results/benchmark \
        --scenes synth0 synth1 --stage val --accept "psnr>=24,ssim>=0.75"
"""

import argparse
import glob
import json
import os
import subprocess
import sys
from collections import defaultdict

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", required=True)
    ap.add_argument("--scenes", nargs="+", required=True)
    ap.add_argument("--stage", default="val",
                    help="stats file prefix: val (eval) or compress")
    ap.add_argument("--step", type=int, default=None,
                    help="specific step; default = last available")
    ap.add_argument("--accept", default="",
                    help="comma-separated metric thresholds, e.g. "
                         "'psnr>=24,ssim>=0.75,lpips<=0.3'")
    args = ap.parse_args()

    summary = defaultdict(list)
    for scene in args.scenes:
        scene_dir = os.path.join(args.results_dir, scene)
        if args.stage == "compress":
            comp_dir = os.path.join(scene_dir, "compression")
            zip_path = os.path.join(scene_dir, "compression.zip")
            if os.path.isdir(comp_dir):
                if os.path.exists(zip_path):
                    os.remove(zip_path)
                subprocess.run(["zip", "-qr", zip_path, comp_dir], check=True)
                summary["size"].append(os.path.getsize(zip_path))
        pattern = os.path.join(
            scene_dir, "stats",
            f"{args.stage}_step{args.step if args.step is not None else '*'}"
            ".json",
        )
        files = sorted(
            glob.glob(pattern),
            key=lambda p: int("".join(filter(str.isdigit, os.path.basename(p))) or 0),
        )
        if not files:
            print(f"WARNING: no stats for scene {scene} ({pattern})")
            continue
        with open(files[-1]) as f:
            stats = json.load(f)
        for k, v in stats.items():
            summary[k].append(v)

    out = {
        k: (float(np.mean(v)) if isinstance(v[0], (int, float)) else v[0])
        for k, v in summary.items()
    }
    out["scenes"] = args.scenes
    path = os.path.join(args.results_dir, f"{args.stage}_summary.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))

    ok = True
    for clause in filter(None, args.accept.split(",")):
        for op in (">=", "<="):
            if op in clause:
                key, val = clause.split(op)
                got = out.get(key.strip())
                want = float(val)
                passed = got is not None and (
                    got >= want if op == ">=" else got <= want
                )
                status = "PASS" if passed else "FAIL"
                print(f"[{status}] {key.strip()} {op} {want} (got {got})")
                ok = ok and passed
                break
        else:
            print(f"unparseable accept clause: {clause}")
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
