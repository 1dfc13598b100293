#!/bin/bash
# Dynamic (STG-style) splat training benchmark
# (reference examples/benchmarks/dyngs/dyngs.sh): multiview video ->
# temporal splats with the Sandwich color decoder + STG compression
# simulation, then per-frame extraction for the sequence codec.
DATA_DIR="${DATA_DIR:-data/N3D}"
RESULT_DIR="${RESULT_DIR:-results/dyngs}"
SCENE_LIST="${SCENE_LIST:-coffee_martini cook_spinach}"
for SCENE in $SCENE_LIST; do
    echo "=== $SCENE ==="
    python examples/dyn_trainer_cli.py \
        --data-dir "$DATA_DIR/$SCENE" \
        --result-dir "$RESULT_DIR/$SCENE" \
        --color-mode sandwich --strategy stg \
        --compression-sim --entropy-model-opt --rd-lambda 0.01
done
