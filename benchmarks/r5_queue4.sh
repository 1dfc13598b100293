#!/bin/bash
# Round-5 queue 4: completes the bf16 leg of the same-seed quality A/B
# (the first attempt lost 1174s to a relay slowdown during scene build
# and was cut at ~step 525; compile caches are warm now).
set -x
cd "$(dirname "$0")/.."
mkdir -p results/r5_evidence
[ -n "$1" ] || { echo "usage: $0 <pid-to-wait-for>"; exit 1; }
while kill -0 "$1" 2>/dev/null; do sleep 10; done

rm -rf results/garden_ab_bf16
timeout 2400 python examples/garden_benchmark.py --n_views 25 \
  --width 648 --height 420 --steps 1500 --cap 120000 --init_pts 60000 \
  --compression_sim --rd_lambda 0.01 \
  --grad_dtype bf16 --attr_dtype bf16 --log_composite \
  --result_dir results/garden_ab_bf16 \
  > results/r5_evidence/garden_ab_bf16_rerun.log 2>&1
tail -3 results/r5_evidence/garden_ab_bf16_rerun.log
echo "=== queue4 done ==="
