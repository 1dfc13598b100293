#!/bin/bash
# Round-5 queue, part 2 (waits for queue 1 / the given pid to free the
# single-tenant chip):
#   1. sfm separation legs (VERDICT item 1 step B): production recipe at
#      648x420 cap 360k with the FIXED MCMC relocation, first without
#      then with compression sim — locates what's left of the plateau.
#   2. tile-size + geometry-packing bench sweep (VERDICT item 4).
#   3. The headline quality run: full-res garden ladder with the fixed
#      MCMC (the round-4 run that hit 20.9 dB, rerun at HEAD).
set -x
cd "$(dirname "$0")/.."
mkdir -p results/r5_evidence
[ -n "$1" ] || { echo "usage: $0 <pid-to-wait-for>"; exit 1; }
while kill -0 "$1" 2>/dev/null; do sleep 10; done

echo "=== self-fit: sfm + fixed MCMC, no sim (1500 steps) ==="
timeout 2700 python examples/self_fit.py --leg sfm --strategy mcmc \
  --steps 1500 --cap 360000 --opacity_reg 0.01 --scale_reg 0.01 \
  --tag mcmc_nosim \
  > results/r5_evidence/selffit_sfm_mcmc_nosim.log 2>&1
tail -2 results/r5_evidence/selffit_sfm_mcmc_nosim.log

echo "=== self-fit: sfm + fixed MCMC + compression sim (1500 steps) ==="
timeout 2700 python examples/self_fit.py --leg sfm --strategy mcmc \
  --steps 1500 --cap 360000 --opacity_reg 0.01 --scale_reg 0.01 \
  --compression_sim --tag mcmc_sim \
  > results/r5_evidence/selffit_sfm_mcmc_sim.log 2>&1
tail -2 results/r5_evidence/selffit_sfm_mcmc_sim.log

echo "=== bench sweep: tile_size x geom_dtype (packed fast config) ==="
for TS in 16 24 32; do
  for GD in f32 u16; do
    GSC_BENCH_TILE=$TS GSC_BENCH_GEOM_DTYPE=$GD GSC_BENCH_AUTO_CAP=1 \
      timeout 1200 python bench.py \
      >> results/r5_evidence/bench_sweep.jsonl 2>/dev/null
  done
done
cat results/r5_evidence/bench_sweep.jsonl

echo "=== queue2 done (launch the headline run separately) ==="
