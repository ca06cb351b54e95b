#!/usr/bin/env bash
# MCMC + PNG-compression on Tanks&Temples (reference
# examples/benchmarks/compression/mcmc_tt.sh — the TanksAndTemples.csv
# schema: train at fixed cap_max with opacity/scale regularizers,
# compress, eval the round trip, summarize). Falls back to procedural
# scenes without data/tandt (no egress in this image):
#   SCENE_DIR=data/tandt CAP_MAX=1000000 MAX_STEPS=30000 ./mcmc_tt.sh
set -e
cd "$(dirname "$0")/../../.."

SCENE_DIR="${SCENE_DIR:-data/tandt}"
CAP_MAX="${CAP_MAX:-1000000}"
RESULT_DIR="${RESULT_DIR:-results/benchmark_mcmc_png_compression_tt}"
MAX_STEPS="${MAX_STEPS:-30000}"
EXTRA_ARGS="${EXTRA_ARGS:-}"
ACCEPT="${ACCEPT:-psnr>=19}"

if [ -d "$SCENE_DIR" ]; then
    SCENE_LIST="${SCENE_LIST:-truck train}"
    # T&T runs at full resolution with the reference's regularizers
    EXTRA_ARGS="$EXTRA_ARGS --data-factor 1 --opacity-reg 0.01 --scale-reg 0.01"
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
    echo "Running $SCENE"
    python examples/simple_trainer.py mcmc \
        --data-dir "$SCENE_DIR/$SCENE" \
        --result-dir "$RESULT_DIR/$SCENE" \
        --max-steps "$MAX_STEPS" \
        --eval-steps "$MAX_STEPS" --save-steps "$MAX_STEPS" \
        --cap-max "$CAP_MAX" \
        --compression png \
        --lpips-net vgg \
        $EXTRA_ARGS
done
# --lpips-net vgg aligns T&T LPIPS with the reference's other benchmarks
# (reference compression/mcmc_tt.sh: "to align with other benchmarks");
# with learned weights present the eval stats report real vgg LPIPS,
# otherwise the proxy is reported under the separate lpips_proxy key.

python examples/benchmarks/summarize_stats.py \
    --results-dir "$RESULT_DIR" --scenes $SCENE_LIST --stage compress \
    --accept "$ACCEPT"
