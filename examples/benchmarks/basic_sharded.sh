#!/usr/bin/env bash
# Multi-device benchmark (reference examples/benchmarks/basic_4gpus.sh:
# 4 GPUs, batch_size 4 ~ 4x throughput, --steps_scaler 0.25). The TPU
# analog trains gaussian-sharded over all visible devices via --sharded;
# on a CPU box it uses a virtual mesh (xla_force_host_platform_device_count)
# so the same script is CI-runnable without hardware.
#   N_DEVICES=8 SCENE_DIR=data/360_v2 MAX_STEPS=30000 ./basic_sharded.sh
set -e
cd "$(dirname "$0")/../.."

N_DEVICES="${N_DEVICES:-4}"
SCENE_DIR="${SCENE_DIR:-data/360_v2}"
RESULT_DIR="${RESULT_DIR:-results/benchmark_sharded}"
MAX_STEPS="${MAX_STEPS:-30000}"
PRESET="${PRESET:-default}"
EXTRA_ARGS="${EXTRA_ARGS:-}"
ACCEPT="${ACCEPT:-psnr>=19}"

# virtual CPU mesh fallback when no multi-chip platform is present
if [ -n "${FORCE_CPU_MESH:-}" ]; then
    export JAX_PLATFORM_NAME=cpu
    export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=$N_DEVICES"
fi

if [ -d "$SCENE_DIR" ]; then
    SCENE_LIST="${SCENE_LIST:-garden bicycle stump bonsai counter kitchen room}"
else
    echo "no $SCENE_DIR — generating procedural scenes"
    SCENE_DIR="${PROC_DIR:-/tmp/tdgs_bench_scenes}"
    SCENE_LIST="${SCENE_LIST:-synth0 synth1}"
    MAX_STEPS="${MAX_STEPS_PROC:-200}"
    i=0
    for SCENE in $SCENE_LIST; do
        [ -f "$SCENE_DIR/$SCENE/sparse/0/cameras.bin" ] || \
            python examples/benchmarks/make_scene.py --out "$SCENE_DIR/$SCENE" --seed $i
        i=$((i+1))
    done
    EXTRA_ARGS="$EXTRA_ARGS --data-factor 1 --capacity 2048 --tile-capacity 256 --isect-capacity 65536 --sh-degree 2"
fi

# batch_size = N_DEVICES cameras per step (each device renders one), and
# the reference's 1/B steps_scaler keeps total work constant
STEPS_SCALER=$(python -c "print(1.0 / $N_DEVICES)")

for SCENE in $SCENE_LIST; do
    case "$SCENE" in
        bonsai|counter|kitchen|room) DATA_FACTOR="--data-factor 2" ;;
        garden|bicycle|stump|treehill|flowers) DATA_FACTOR="--data-factor 4" ;;
        *) DATA_FACTOR="" ;;
    esac
    echo "Running $SCENE on $N_DEVICES devices"
    python examples/simple_trainer.py "$PRESET" $DATA_FACTOR \
        --data-dir "$SCENE_DIR/$SCENE" \
        --result-dir "$RESULT_DIR/$SCENE" \
        --max-steps "$MAX_STEPS" \
        --eval-steps "$MAX_STEPS" --save-steps "$MAX_STEPS" \
        --sharded --batch-size "$N_DEVICES" \
        --steps-scaler "$STEPS_SCALER" \
        $EXTRA_ARGS
done

python examples/benchmarks/summarize_stats.py \
    --results-dir "$RESULT_DIR" --scenes $SCENE_LIST --stage val \
    --accept "$ACCEPT"
