#!/usr/bin/env bash
# MCMC + PNG-compression benchmark (reference
# examples/benchmarks/compression/mcmc.sh: train mcmc at a fixed cap_max,
# compress with the PNG codec, eval the round trip, summarize avg
# psnr/ssim/lpips + zipped payload size — the MipNeRF360.csv schema).
# Without data/360_v2 (no egress in this image) it falls back to
# procedural scenes; override via env:
#   SCENE_DIR=data/360_v2 CAP_MAX=1000000 MAX_STEPS=30000 ./mcmc.sh
set -e
cd "$(dirname "$0")/../../.."

SCENE_DIR="${SCENE_DIR:-data/360_v2}"
CAP_MAX="${CAP_MAX:-1000000}"
RESULT_DIR="${RESULT_DIR:-results/benchmark_mcmc_png_compression}"
MAX_STEPS="${MAX_STEPS:-30000}"
EXTRA_ARGS="${EXTRA_ARGS:-}"
ACCEPT="${ACCEPT:-psnr>=19}"

if [ -d "$SCENE_DIR" ]; then
    SCENE_LIST="${SCENE_LIST:-garden bicycle stump bonsai counter kitchen room treehill flowers}"
else
    echo "no $SCENE_DIR — generating procedural scenes"
    SCENE_DIR="${PROC_DIR:-/tmp/tdgs_bench_scenes}"
    SCENE_LIST="${SCENE_LIST:-synth0 synth1}"
    MAX_STEPS="${MAX_STEPS_PROC:-400}"
    CAP_MAX=2048
    i=0
    for SCENE in $SCENE_LIST; do
        [ -f "$SCENE_DIR/$SCENE/sparse/0/cameras.bin" ] || \
            python examples/benchmarks/make_scene.py --out "$SCENE_DIR/$SCENE" --seed $i
        i=$((i+1))
    done
    EXTRA_ARGS="$EXTRA_ARGS --data-factor 1 --capacity 2048 --tile-capacity 256 --isect-capacity 65536 --sh-degree 2"
fi

for SCENE in $SCENE_LIST; do
    case "$SCENE" in
        bonsai|counter|kitchen|room) DATA_FACTOR="--data-factor 2" ;;
        garden|bicycle|stump|treehill|flowers) DATA_FACTOR="--data-factor 4" ;;
        *) DATA_FACTOR="" ;;
    esac
    echo "Running $SCENE"
    python examples/simple_trainer.py mcmc $DATA_FACTOR \
        --data-dir "$SCENE_DIR/$SCENE" \
        --result-dir "$RESULT_DIR/$SCENE" \
        --max-steps "$MAX_STEPS" \
        --eval-steps "$MAX_STEPS" --save-steps "$MAX_STEPS" \
        --cap-max "$CAP_MAX" \
        --compression png \
        $EXTRA_ARGS
done

# compress stage: round-trip quality + zipped payload size per scene
python examples/benchmarks/summarize_stats.py \
    --results-dir "$RESULT_DIR" --scenes $SCENE_LIST --stage compress \
    --accept "$ACCEPT"
