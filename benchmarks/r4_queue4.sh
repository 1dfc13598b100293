#!/bin/bash
# Round-4 evidence queue, part 4. The dyn benchmark's in-process codec
# subprocess deadlocked against the relay's one-process-per-chip rule
# (parent held a live TPU context while waiting on the child) — so the
# codec ladder runs here standalone over the already-exported frames,
# and the RD table is assembled from its stats files.
set -x
cd "$(dirname "$0")/.."
mkdir -p results/r4_evidence

echo "=== tracked-sequence codec rate ladder (standalone) ==="
timeout 900 python examples/compress_ply_sequence.py \
  --ply_dir results/dyn_stand_in/frames \
  --output_dir results/dyn_stand_in/seq_codec \
  --rate_points rp0 rp2 rp3 \
  --eval_views 3 --eval_width 324 --eval_height 210 \
  --eval_frame_stride 4 \
  > results/r4_evidence/seq_codec.log 2>&1
tail -5 results/r4_evidence/seq_codec.log
python - <<'EOF'
import json, os
rows = [{"phase": "train", "steps": 2000, "secs": 628.6,
         "psnr": 29.154, "ssim": 0.993}]
for rp in ["rp0", "rp2", "rp3"]:
    sp = os.path.join("results/dyn_stand_in/seq_codec", rp, "stats.json")
    if os.path.exists(sp):
        rows.append(json.load(open(sp)))
with open("results/dyn_stand_in/rd_table.json", "w") as f:
    json.dump(rows, f, indent=1)
print(json.dumps(rows))
EOF

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

echo "=== queue4 done ==="
