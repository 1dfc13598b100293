#!/bin/bash
# Round-5 queue, part 3: the headline quality run — full-res garden
# ladder, cap 360k, 8k steps, compression sim + PNG codec round trip,
# with the round-5 MCMC relocation fix and skip fingerprinting live.
# Round 4's identical recipe plateaued at 20.88 dB with ~55% dead
# capacity; the fix must move this materially (VERDICT r5 item 1 "Done"
# = >=28-30 dB or a named root cause).
set -x
cd "$(dirname "$0")/.."
mkdir -p results/r5_evidence
[ -n "$1" ] || { echo "usage: $0 <pid-to-wait-for>"; exit 1; }
while kill -0 "$1" 2>/dev/null; do sleep 10; done

echo "=== finer exchange-cap sweep (the 8192..65536 range dropped 0 rows;"
echo "    locate the knee) ==="
timeout 1200 python examples/exchange_cap_sweep.py \
  --splats results/garden_ladder_r4/cap_360000/ckpts/ckpt_4000.npz \
  --caps 1024 2048 4096 8192 \
  --out results/r5_evidence/exchange_cap_sweep_fine.json --n_views 8 \
  > results/r5_evidence/exchange_sweep_fine.log 2>&1
tail -5 results/r5_evidence/exchange_sweep_fine.log

timeout 14400 python examples/garden_benchmark.py --n_views 49 \
  --width 1297 --height 840 --steps 8000 --cap 360000 \
  --init_pts 100000 --compression_sim --rd_lambda 0.01 \
  --grad_dtype f32 \
  --result_dir results/garden_ladder_r5 \
  > results/r5_evidence/garden_ladder_r5.log 2>&1
tail -5 results/r5_evidence/garden_ladder_r5.log

echo "=== queue3 done ==="
