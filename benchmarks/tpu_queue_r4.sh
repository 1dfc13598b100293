#!/bin/bash
# Round-4 single-chip TPU work queue: run AFTER the garden quality run
# frees the chip (only one process may use the relay at a time).
# Each stage appends JSON evidence under results/.
set -x
cd "$(dirname "$0")/.."
mkdir -p results/r4_evidence

echo "=== log-composite A/B (packed config) ==="
GSC_BENCH_GRAD_DTYPE=bf16 GSC_BENCH_ATTR_DTYPE=bf16 GSC_BENCH_LOG_COMPOSITE=1 \
  python bench.py 2>/dev/null | tail -1 | tee results/r4_evidence/bench_packed_logcomp.json

echo "=== 2DGS kernel throughput ==="
python profiling/bench_2dgs.py 2>/dev/null | tail -1 | tee results/r4_evidence/bench_2dgs.json

echo "=== 10M-gaussian headroom ==="
python profiling/bench_10m.py 2>/dev/null | tail -1 | tee results/r4_evidence/bench_10m.json

echo "=== bf16-packed quality A/B (short garden, same seed/recipe) ==="
python examples/garden_benchmark.py --steps 2500 --cap 360000 \
  --compression_sim --rd_lambda 0.01 --grad_dtype bf16 \
  --attr_dtype bf16 --log_composite \
  --result_dir results/garden_ab_bf16 \
  > results/r4_evidence/garden_ab_bf16.log 2>&1
tail -3 results/r4_evidence/garden_ab_bf16.log
python examples/garden_benchmark.py --steps 2500 --cap 360000 \
  --compression_sim --rd_lambda 0.01 --grad_dtype f32 \
  --result_dir results/garden_ab_f32 \
  > results/r4_evidence/garden_ab_f32.log 2>&1
tail -3 results/r4_evidence/garden_ab_f32.log

echo "=== 2DGS trainer quality run (648x420) ==="
python examples/benchmark_2dgs.py --result_dir results/garden_2dgs \
  > results/r4_evidence/benchmark_2dgs.log 2>&1
tail -3 results/r4_evidence/benchmark_2dgs.log

echo "=== dynamic-splat RD table ==="
python examples/dyn_benchmark.py --n_views 8 --n_frames 12 --steps 2000 \
  --cap 80000 --result_dir results/dyn_stand_in \
  > results/r4_evidence/dyn_benchmark.log 2>&1
tail -5 results/r4_evidence/dyn_benchmark.log

echo "=== exchange-cap sweep (trained garden model) ==="
python examples/exchange_cap_sweep.py \
  --splats results/garden_ladder_r4/cap_360000/splats_final.npz \
  --out results/exchange_cap_sweep.json \
  > results/r4_evidence/exchange_sweep.log 2>&1
tail -5 results/r4_evidence/exchange_sweep.log

echo "=== queue done ==="
