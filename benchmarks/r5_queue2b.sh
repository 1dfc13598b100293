#!/bin/bash
# Round-5 queue 2b (reordered for remaining wall-clock): bench sweep ->
# headline quality run -> sfm separation legs. The original queue2/3
# order would have pushed the headline run past the round boundary after
# a relay slowdown stretched the A/B legs.
set -x
cd "$(dirname "$0")/.."
mkdir -p results/r5_evidence
[ -n "$1" ] || { echo "usage: $0 <pid-to-wait-for>"; exit 1; }
while kill -0 "$1" 2>/dev/null; do sleep 10; done

echo "=== bench sweep: tile_size x geom_dtype (packed fast config) ==="
for TS in 16 24 32; do
  for GD in f32 u16; do
    GSC_BENCH_TILE=$TS GSC_BENCH_GEOM_DTYPE=$GD GSC_BENCH_AUTO_CAP=1 \
      timeout 1200 python bench.py \
      >> results/r5_evidence/bench_sweep.jsonl 2>/dev/null
  done
done
cat results/r5_evidence/bench_sweep.jsonl

echo "=== headline: full-res garden ladder, fixed MCMC, 8k steps ==="
timeout 12600 python examples/garden_benchmark.py --n_views 49 \
  --width 1297 --height 840 --steps 8000 --cap 360000 \
  --init_pts 100000 --compression_sim --rd_lambda 0.01 \
  --grad_dtype f32 \
  --result_dir results/garden_ladder_r5 \
  > results/r5_evidence/garden_ladder_r5.log 2>&1
tail -5 results/r5_evidence/garden_ladder_r5.log

echo "=== finer exchange-cap sweep ==="
timeout 1200 python examples/exchange_cap_sweep.py \
  --splats results/garden_ladder_r4/cap_360000/ckpts/ckpt_4000.npz \
  --caps 1024 2048 4096 8192 \
  --out results/r5_evidence/exchange_cap_sweep_fine.json --n_views 8 \
  > results/r5_evidence/exchange_sweep_fine.log 2>&1
tail -3 results/r5_evidence/exchange_sweep_fine.log

echo "=== self-fit: sfm + fixed MCMC, no sim ==="
timeout 2700 python examples/self_fit.py --leg sfm --strategy mcmc \
  --steps 1500 --cap 360000 --opacity_reg 0.01 --scale_reg 0.01 \
  --tag mcmc_nosim \
  > results/r5_evidence/selffit_sfm_mcmc_nosim.log 2>&1
tail -2 results/r5_evidence/selffit_sfm_mcmc_nosim.log

echo "=== self-fit: sfm + fixed MCMC + compression sim ==="
timeout 2700 python examples/self_fit.py --leg sfm --strategy mcmc \
  --steps 1500 --cap 360000 --opacity_reg 0.01 --scale_reg 0.01 \
  --compression_sim --tag mcmc_sim \
  > results/r5_evidence/selffit_sfm_mcmc_sim.log 2>&1
tail -2 results/r5_evidence/selffit_sfm_mcmc_sim.log

echo "=== queue2b done ==="
