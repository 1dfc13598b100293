#!/bin/bash
# GSCodec core recipe: MCMC + training-time compression simulation + PNG codec
# (reference examples/benchmarks/compression/final_exp/mcmc_tt_sim.sh:41-60)
SCENE_DIR="${SCENE_DIR:-data/tandt}"
RESULT_DIR="${RESULT_DIR:-results/compression}"
SCENE_LIST="${SCENE_LIST:-train truck}"
CAP_MAX="${CAP_MAX:-1000000}"
for SCENE in $SCENE_LIST; do
    echo "=== $SCENE (cap $CAP_MAX) ==="
    python examples/simple_trainer.py mcmc \
        --data-dir "$SCENE_DIR/$SCENE" --data-factor 1 \
        --result-dir "$RESULT_DIR/$SCENE" \
        --mcmc-cap-max $CAP_MAX \
        --compression-sim true --entropy-model-opt true \
        --rd-lambda 0.01 --shN-ada-mask-opt true
done
