#!/usr/bin/env bash
# Bilateral-grid benchmark (reference examples/benchmarks/bilarf/mcmc_bilarf.sh:
# mcmc preset + --use_bilateral_grid on BilaRF edit scenes, spiral trajectory).
# Per-image bilateral grids absorb exposure/white-balance variation; eval
# reports both raw and color-corrected (cc_*) metrics. Falls back to
# procedural scenes without data; override via env like the other scripts:
#   SCENE_DIR=data/bilarf/bilarf_data/editscenes \
#     SCENE_LIST="rawnerf_windowlegovary scibldg" ./mcmc_bilarf.sh
set -e
cd "$(dirname "$0")/../../.."

SCENE_DIR="${SCENE_DIR:-data/bilarf/bilarf_data/editscenes}"
RESULT_DIR="${RESULT_DIR:-results/benchmark_bilarf}"
MAX_STEPS="${MAX_STEPS:-30000}"
DATA_FACTOR="${DATA_FACTOR:-4}"
RENDER_TRAJ_PATH="${RENDER_TRAJ_PATH:-spiral}"
EXTRA_ARGS="${EXTRA_ARGS:-}"
ACCEPT="${ACCEPT:-cc_psnr>=19}"

if [ -d "$SCENE_DIR" ]; then
    SCENE_LIST="${SCENE_LIST:-rawnerf_windowlegovary rawnerf_sharpshadow scibldg}"
else
    echo "no $SCENE_DIR — generating procedural scenes"
    SCENE_DIR="${PROC_DIR:-/tmp/tdgs_bench_scenes}"
    SCENE_LIST="${SCENE_LIST:-synth0 synth1}"
    MAX_STEPS="${MAX_STEPS_PROC:-400}"
    DATA_FACTOR=1
    i=0
    for SCENE in $SCENE_LIST; do
        [ -f "$SCENE_DIR/$SCENE/sparse/0/cameras.bin" ] || \
            python examples/benchmarks/make_scene.py --out "$SCENE_DIR/$SCENE" --seed $i
        i=$((i+1))
    done
    EXTRA_ARGS="$EXTRA_ARGS --capacity 2048 --tile-capacity 256 --isect-capacity 65536 --sh-degree 2"
fi

for SCENE in $SCENE_LIST; do
    echo "Running $SCENE"
    python examples/simple_trainer.py mcmc \
        --data-factor "$DATA_FACTOR" \
        --use-bilateral-grid \
        --render-traj-path "$RENDER_TRAJ_PATH" \
        --data-dir "$SCENE_DIR/$SCENE" \
        --result-dir "$RESULT_DIR/$SCENE" \
        --max-steps "$MAX_STEPS" \
        --eval-steps "$MAX_STEPS" --save-steps "$MAX_STEPS" \
        $EXTRA_ARGS
done

python examples/benchmarks/summarize_stats.py \
    --results-dir "$RESULT_DIR" --scenes $SCENE_LIST --stage val \
    --accept "$ACCEPT"
