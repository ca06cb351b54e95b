#!/usr/bin/env bash
# MCMC-strategy benchmark (reference examples/benchmarks/mcmc.sh: MCMC
# strategy with cap_max, same scene conventions as basic.sh).
# 7k/30k). When data/360_v2 is absent (no egress in this image) it falls
# back to procedural scenes; override via env:
#   SCENE_DIR=data/360_v2 SCENE_LIST="garden bicycle" MAX_STEPS=30000 ./basic.sh
set -e
cd "$(dirname "$0")/../.."

SCENE_DIR="${SCENE_DIR:-data/360_v2}"
RESULT_DIR="${RESULT_DIR:-results/benchmark_mcmc}"
MAX_STEPS="${MAX_STEPS:-30000}"
PRESET="${PRESET:-mcmc}"
EXTRA_ARGS="${EXTRA_ARGS:-}"
ACCEPT="${ACCEPT:-psnr>=20}"

if [ -d "$SCENE_DIR" ]; then
    SCENE_LIST="${SCENE_LIST:-garden bicycle stump bonsai counter kitchen room}"
else
    echo "no $SCENE_DIR — generating procedural scenes"
    SCENE_DIR="${PROC_DIR:-/tmp/tdgs_bench_scenes}"
    SCENE_LIST="${SCENE_LIST:-synth0 synth1}"
    MAX_STEPS="${MAX_STEPS_PROC:-400}"
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
    python examples/simple_trainer.py "$PRESET" $DATA_FACTOR \
        --data-dir "$SCENE_DIR/$SCENE" \
        --result-dir "$RESULT_DIR/$SCENE" \
        --max-steps "$MAX_STEPS" \
        --eval-steps "$MAX_STEPS" --save-steps "$MAX_STEPS" \
        $EXTRA_ARGS
done

python examples/benchmarks/summarize_stats.py \
    --results-dir "$RESULT_DIR" --scenes $SCENE_LIST --stage val \
    --accept "$ACCEPT"
