"""Benchmark harness scripts stay parseable and self-consistent
(reference examples/benchmarks/*.sh conventions, SURVEY.md §6)."""

import glob
import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "examples", "benchmarks")


def _scripts():
    return sorted(glob.glob(os.path.join(BENCH, "**", "*.sh"), recursive=True))


def test_scripts_present():
    names = {os.path.relpath(s, BENCH) for s in _scripts()}
    # one analog per reference benchmark script family
    for expected in [
        "basic.sh", "basic_2dgs.sh", "basic_sharded.sh", "mcmc.sh",
        "mcmc_sharded.sh", "3dgut/mcmc.sh", "3dgut/mcmc_zipnerf.sh",
        "fisheye/mcmc.sh", "fisheye/mcmc_undistorted.sh",
        "bilarf/mcmc_bilarf.sh", "compression/mcmc.sh",
        "compression/mcmc_tt.sh",
    ]:
        assert expected in names, f"missing benchmark script {expected}"


def test_scripts_parse_and_use_known_flags():
    """bash -n each script; every --flag it passes to simple_trainer.py
    must be a real Config field / CLI extra (catches bitrot when Config
    fields are renamed)."""
    import dataclasses
    import sys

    sys.path.insert(0, REPO)
    from tdgs.training.config import Config

    known = {f.name.replace("_", "-") for f in dataclasses.fields(Config)}
    # CLI-only extras defined in examples/simple_trainer.py build_parser
    # (everything else a script passes must be a real Config field)
    known |= {"cap-max", "absgrad", "grow-grad2d", "ckpt"}
    for script in _scripts():
        subprocess.run(["bash", "-n", script], check=True)
        text = open(script).read()
        # Join backslash-continued lines into logical commands, then check
        # every --flag on trainer invocations AND on EXTRA_ARGS/BASE_ARGS
        # style assignments (which get spliced into trainer commands).
        # Non-trainer invocations (make_scene.py, summarize_stats.py) and
        # comment lines are skipped.
        logical = re.sub(r"\\\n", " ", text)
        for line in logical.splitlines():
            stripped = line.strip()
            if stripped.startswith("#"):
                continue
            is_trainer = "simple_trainer.py" in stripped
            is_args_var = re.match(r'[A-Z_]*ARGS[A-Z_]*[+]?="', stripped)
            if not (is_trainer or is_args_var):
                continue
            for flag in re.findall(r"--([a-z][a-z0-9-]*)", stripped):
                base = flag[3:] if flag.startswith("no-") else flag
                assert base in known, (
                    f"{os.path.relpath(script, BENCH)} passes unknown flag "
                    f"--{flag}"
                )
