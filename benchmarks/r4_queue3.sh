#!/bin/bash
# Round-4 evidence queue, part 3: reordered for remaining wall-clock —
# exchange-cap sweep (cheap, SURVEY §7 must-measure) before the 2DGS
# trainer leg; bf16 A/B legs last if time allows. Waits for the dyn
# benchmark (pid $1) to free the single relay chip.
set -x
cd "$(dirname "$0")/.."
mkdir -p results/r4_evidence
# Guard the pid argument (ADVICE r4): a missing/recycled pid exits the
# wait loop instantly and launches against a busy single-tenant chip.
[ -n "$1" ] || { echo "usage: $0 <pid-to-wait-for>"; exit 1; }
while kill -0 "$1" 2>/dev/null; do sleep 10; done

echo "=== exchange-cap sweep (trained garden ckpt) ==="
timeout 900 python examples/exchange_cap_sweep.py \
  --splats results/garden_ladder_r4/cap_360000/ckpts/ckpt_4000.npz \
  --out results/exchange_cap_sweep.json --n_views 8 \
  > results/r4_evidence/exchange_sweep.log 2>&1
tail -5 results/r4_evidence/exchange_sweep.log

echo "=== 2DGS trainer quality run (648x420) ==="
timeout 1500 python examples/benchmark_2dgs.py --steps 1200 \
  --result_dir results/garden_2dgs \
  > results/r4_evidence/benchmark_2dgs.log 2>&1
tail -3 results/r4_evidence/benchmark_2dgs.log

echo "=== bf16-packed quality A/B (short garden, same seed/recipe) ==="
rm -rf results/garden_ab_bf16 results/garden_ab_f32
timeout 1200 python examples/garden_benchmark.py --n_views 25 \
  --width 648 --height 420 --steps 1500 --cap 120000 --init_pts 60000 \
  --compression_sim --rd_lambda 0.01 \
  --grad_dtype bf16 --attr_dtype bf16 --log_composite \
  --result_dir results/garden_ab_bf16 \
  > results/r4_evidence/garden_ab_bf16.log 2>&1
tail -3 results/r4_evidence/garden_ab_bf16.log
timeout 1200 python examples/garden_benchmark.py --n_views 25 \
  --width 648 --height 420 --steps 1500 --cap 120000 --init_pts 60000 \
  --compression_sim --rd_lambda 0.01 \
  --grad_dtype f32 \
  --result_dir results/garden_ab_f32 \
  > results/r4_evidence/garden_ab_f32.log 2>&1
tail -3 results/r4_evidence/garden_ab_f32.log

echo "=== queue3 done ==="
