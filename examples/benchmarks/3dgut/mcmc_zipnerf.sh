#!/usr/bin/env bash
# 3DGUT on ZipNeRF fisheye captures (reference
# examples/benchmarks/3dgut/mcmc_zipnerf.sh: UT projection + eval3d
# world-space rasterization + bilateral grid on distorted cameras).
# Requires real ZipNeRF data (the procedural scenes are pinhole):
#   SCENE_DIR=data/zipnerf SCENE_LIST="berlin nyc" ./mcmc_zipnerf.sh
set -e
cd "$(dirname "$0")/../../.."

SCENE_DIR="${SCENE_DIR:-data/zipnerf}"
RESULT_DIR="${RESULT_DIR:-results/benchmark_mcmc_zipnerf_3dgut}"
MAX_STEPS="${MAX_STEPS:-30000}"
CAP_MAX="${CAP_MAX:-2000000}"
DATA_FACTOR="${DATA_FACTOR:-4}"
EXTRA_ARGS="${EXTRA_ARGS:-}"
ACCEPT="${ACCEPT:-psnr>=19}"
SCENE_LIST="${SCENE_LIST:-nyc alameda berlin london}"

if [ ! -d "$SCENE_DIR" ]; then
    echo "no $SCENE_DIR — 3DGUT zipnerf benchmark needs real captures" >&2
    echo "(UT/eval3d coverage runs in tests/test_ut_projection.py and" >&2
    echo " tests/test_eval3d.py on synthetic rays; pinhole 3DGUT in" >&2
    echo " examples/benchmarks/3dgut/mcmc.sh)" >&2
    exit 1
fi

for SCENE in $SCENE_LIST; do
    echo "Running $SCENE (3DGUT)"
    python examples/simple_trainer.py mcmc --data-factor "$DATA_FACTOR" \
        --data-dir "$SCENE_DIR/$SCENE" \
        --result-dir "$RESULT_DIR/$SCENE" \
        --max-steps "$MAX_STEPS" \
        --eval-steps "$MAX_STEPS" --save-steps "$MAX_STEPS" \
        --cap-max "$CAP_MAX" \
        --with-ut --with-eval3d \
        --opacity-reg 0.001 \
        --init-scale 0.5 \
        --use-bilateral-grid \
        --render-traj-path ellipse \
        --camera-model fisheye \
        $EXTRA_ARGS
done

python examples/benchmarks/summarize_stats.py \
    --results-dir "$RESULT_DIR" --scenes $SCENE_LIST --stage val \
    --accept "$ACCEPT"
