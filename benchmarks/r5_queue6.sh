#!/bin/bash
# Round-5 queue 6: everything that follows the headline run (pid $1),
# consolidated after the queue2b/3 process tangle (an orphaned headline
# child survived a shell kill and queue2b would have double-launched it).
# Order: u16 bench debug (stderr captured) -> finer exchange sweep ->
# bf16 A/B rerun -> sfm separation legs.
set -x
cd "$(dirname "$0")/.."
mkdir -p results/r5_evidence
[ -n "$1" ] || { echo "usage: $0 <pid-to-wait-for>"; exit 1; }
while kill -0 "$1" 2>/dev/null; do sleep 10; done

echo "=== u16 bench debug ==="
GSC_BENCH_TILE=32 GSC_BENCH_GEOM_DTYPE=u16 GSC_BENCH_AUTO_CAP=1 \
  timeout 1200 python bench.py \
  > results/r5_evidence/bench_u16_debug.log 2>&1
tail -20 results/r5_evidence/bench_u16_debug.log

echo "=== finer exchange-cap sweep ==="
timeout 1200 python examples/exchange_cap_sweep.py \
  --splats results/garden_ladder_r4/cap_360000/ckpts/ckpt_4000.npz \
  --caps 1024 2048 4096 8192 \
  --out results/r5_evidence/exchange_cap_sweep_fine.json --n_views 8 \
  > results/r5_evidence/exchange_sweep_fine.log 2>&1
tail -3 results/r5_evidence/exchange_sweep_fine.log

echo "=== bf16 A/B rerun ==="
rm -rf results/garden_ab_bf16
timeout 2400 python examples/garden_benchmark.py --n_views 25 \
  --width 648 --height 420 --steps 1500 --cap 120000 --init_pts 60000 \
  --compression_sim --rd_lambda 0.01 \
  --grad_dtype bf16 --attr_dtype bf16 --log_composite \
  --result_dir results/garden_ab_bf16 \
  > results/r5_evidence/garden_ab_bf16_rerun.log 2>&1
tail -3 results/r5_evidence/garden_ab_bf16_rerun.log

echo "=== self-fit: sfm + fixed MCMC, no sim ==="
timeout 2700 python examples/self_fit.py --leg sfm --strategy mcmc \
  --steps 1500 --cap 360000 --opacity_reg 0.01 --scale_reg 0.01 \
  --tag mcmc_nosim \
  > results/r5_evidence/selffit_sfm_mcmc_nosim.log 2>&1
tail -2 results/r5_evidence/selffit_sfm_mcmc_nosim.log

echo "=== queue6 done ==="
