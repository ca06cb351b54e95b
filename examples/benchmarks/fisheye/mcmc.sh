#!/usr/bin/env bash
# Fisheye benchmark (reference examples/benchmarks/fisheye/mcmc_zipnerf.sh:
# ZipNeRF fisheye captures trained with --camera_model fisheye). Points at
# data/zipnerf by default; there is no procedural fisheye fallback (the
# synthetic scenes are pinhole), so this script requires real data:
#   SCENE_DIR=data/zipnerf SCENE_LIST="berlin nyc" ./mcmc.sh
set -e
cd "$(dirname "$0")/../../.."

SCENE_DIR="${SCENE_DIR:-data/zipnerf}"
RESULT_DIR="${RESULT_DIR:-results/benchmark_mcmc_fisheye}"
MAX_STEPS="${MAX_STEPS:-30000}"
CAP_MAX="${CAP_MAX:-1000000}"
EXTRA_ARGS="${EXTRA_ARGS:-}"
ACCEPT="${ACCEPT:-psnr>=19}"
SCENE_LIST="${SCENE_LIST:-berlin london nyc alameda}"
DATA_FACTOR="${DATA_FACTOR:-2}"

if [ ! -d "$SCENE_DIR" ]; then
    echo "no $SCENE_DIR — fisheye benchmark needs real captures" >&2
    echo "(fisheye camera-model coverage is tested in tests/test_projection.py" >&2
    echo " and tests/test_ut_projection.py on synthetic rays)" >&2
    exit 1
fi

for SCENE in $SCENE_LIST; do
    echo "Running $SCENE"
    python examples/simple_trainer.py mcmc --data-factor "$DATA_FACTOR" \
        --data-dir "$SCENE_DIR/$SCENE" \
        --result-dir "$RESULT_DIR/$SCENE" \
        --max-steps "$MAX_STEPS" \
        --eval-steps "$MAX_STEPS" --save-steps "$MAX_STEPS" \
        --cap-max "$CAP_MAX" \
        --camera-model fisheye \
        $EXTRA_ARGS
done

python examples/benchmarks/summarize_stats.py \
    --results-dir "$RESULT_DIR" --scenes $SCENE_LIST --stage val \
    --accept "$ACCEPT"
