#!/usr/bin/env bash
# ZipNeRF captures pre-undistorted to pinhole (reference
# examples/benchmarks/fisheye/mcmc_zipnerf_undistorted.sh) — the control
# arm for the fisheye camera-model run in ./mcmc.sh: same scenes, data
# already rectified, default pinhole projection.
#   SCENE_DIR=data/zipnerf_undistorted SCENE_LIST="berlin nyc" ./mcmc_undistorted.sh
set -e
cd "$(dirname "$0")/../../.."

SCENE_DIR="${SCENE_DIR:-data/zipnerf_undistorted}"
RESULT_DIR="${RESULT_DIR:-results/benchmark_mcmc_zipnerf_undistorted}"
MAX_STEPS="${MAX_STEPS:-30000}"
CAP_MAX="${CAP_MAX:-2000000}"
DATA_FACTOR="${DATA_FACTOR:-4}"
EXTRA_ARGS="${EXTRA_ARGS:-}"
ACCEPT="${ACCEPT:-psnr>=19}"
SCENE_LIST="${SCENE_LIST:-berlin london nyc alameda}"

if [ ! -d "$SCENE_DIR" ]; then
    echo "no $SCENE_DIR — undistorted zipnerf benchmark needs real captures" >&2
    exit 1
fi

for SCENE in $SCENE_LIST; do
    echo "Running $SCENE (undistorted)"
    python examples/simple_trainer.py mcmc --data-factor "$DATA_FACTOR" \
        --data-dir "$SCENE_DIR/$SCENE" \
        --result-dir "$RESULT_DIR/$SCENE" \
        --max-steps "$MAX_STEPS" \
        --eval-steps "$MAX_STEPS" --save-steps "$MAX_STEPS" \
        --cap-max "$CAP_MAX" \
        --opacity-reg 0.001 \
        --init-scale 0.5 \
        --use-bilateral-grid \
        --render-traj-path ellipse \
        $EXTRA_ARGS
done

python examples/benchmarks/summarize_stats.py \
    --results-dir "$RESULT_DIR" --scenes $SCENE_LIST --stage val \
    --accept "$ACCEPT"
