#!/usr/bin/env bash
# Multi-device MCMC benchmark (reference examples/benchmarks/mcmc_4gpus.sh:
# 4 GPUs, --steps_scaler 0.25, fixed cap_max). The TPU analog trains
# gaussian-sharded over all visible devices via --sharded; on a CPU box a
# virtual mesh (FORCE_CPU_MESH=1) makes the same script CI-runnable.
#   N_DEVICES=8 SCENE_DIR=data/360_v2 CAP_MAX=250000 ./mcmc_sharded.sh
set -e
cd "$(dirname "$0")/../.."

N_DEVICES="${N_DEVICES:-4}"
SCENE_DIR="${SCENE_DIR:-data/360_v2}"
RESULT_DIR="${RESULT_DIR:-results/benchmark_mcmc_sharded}"
MAX_STEPS="${MAX_STEPS:-30000}"
CAP_MAX="${CAP_MAX:-250000}"
EXTRA_ARGS="${EXTRA_ARGS:-}"
ACCEPT="${ACCEPT:-psnr>=19}"

if [ -n "${FORCE_CPU_MESH:-}" ]; then
    export JAX_PLATFORM_NAME=cpu
    export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=$N_DEVICES"
fi

if [ -d "$SCENE_DIR" ]; then
    SCENE_LIST="${SCENE_LIST:-bonsai}"
else
    echo "no $SCENE_DIR — generating procedural scenes"
    SCENE_DIR="${PROC_DIR:-/tmp/tdgs_bench_scenes}"
    SCENE_LIST="${SCENE_LIST:-synth0}"
    MAX_STEPS="${MAX_STEPS_PROC:-200}"
    CAP_MAX=4096
    [ -f "$SCENE_DIR/synth0/sparse/0/cameras.bin" ] || \
        python examples/benchmarks/make_scene.py --out "$SCENE_DIR/synth0" --seed 0
    EXTRA_ARGS="$EXTRA_ARGS --data-factor 1 --tile-capacity 256 --isect-capacity 65536 --sh-degree 2"
fi

STEPS_SCALER=$(python -c "print(1.0 / $N_DEVICES)")

for SCENE in $SCENE_LIST; do
    case "$SCENE" in
        bonsai|counter|kitchen|room) DATA_FACTOR="--data-factor 2" ;;
        garden|bicycle|stump|treehill|flowers) DATA_FACTOR="--data-factor 4" ;;
        *) DATA_FACTOR="" ;;
    esac
    echo "Running $SCENE (mcmc) on $N_DEVICES devices"
    python examples/simple_trainer.py mcmc $DATA_FACTOR \
        --data-dir "$SCENE_DIR/$SCENE" \
        --result-dir "$RESULT_DIR/$SCENE" \
        --max-steps "$MAX_STEPS" \
        --eval-steps "$MAX_STEPS" --save-steps "$MAX_STEPS" \
        --cap-max "$CAP_MAX" \
        --sharded --batch-size "$N_DEVICES" \
        --steps-scaler "$STEPS_SCALER" \
        $EXTRA_ARGS
done

python examples/benchmarks/summarize_stats.py \
    --results-dir "$RESULT_DIR" --scenes $SCENE_LIST --stage val \
    --accept "$ACCEPT"
