#!/bin/bash
# 3DGS default training benchmark (reference examples/benchmarks/basic.sh)
SCENE_DIR="${SCENE_DIR:-data/360_v2}"
RESULT_DIR="${RESULT_DIR:-results/benchmark}"
SCENE_LIST="${SCENE_LIST:-garden bicycle stump bonsai counter kitchen room}"
for SCENE in $SCENE_LIST; do
    if [ "$SCENE" = "bonsai" ] || [ "$SCENE" = "counter" ] || [ "$SCENE" = "kitchen" ] || [ "$SCENE" = "room" ]; then
        FACTOR=2
    else
        FACTOR=4
    fi
    echo "=== $SCENE (factor $FACTOR) ==="
    python examples/simple_trainer.py default \
        --data-dir "$SCENE_DIR/$SCENE" --data-factor $FACTOR \
        --result-dir "$RESULT_DIR/$SCENE"
done
