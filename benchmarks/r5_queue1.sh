#!/bin/bash
# Round-5 queue, part 1: the self-fit diagnostic ladder (VERDICT r5
# item 1) + the evidence legs that died with round 4's session restart
# (VERDICT r5 item 3). Short legs first; every leg under a hard timeout
# with its own log so a death never takes the queue down.
set -x
cd "$(dirname "$0")/.."
mkdir -p results/r5_evidence results/self_fit

SF="timeout 1800 python examples/self_fit.py"

echo "=== self-fit: oracle (GT params, no training — eval-path floor) ==="
$SF --leg oracle --tag soft --cutoff_mode soft \
  > results/r5_evidence/selffit_oracle_soft.log 2>&1
tail -2 results/r5_evidence/selffit_oracle_soft.log
$SF --leg oracle --tag exact --cutoff_mode exact \
  > results/r5_evidence/selffit_oracle_exact.log 2>&1
tail -2 results/r5_evidence/selffit_oracle_exact.log

echo "=== self-fit: gttrain (train FROM the GT params, 1000 steps) ==="
$SF --leg gttrain --steps 1000 \
  > results/r5_evidence/selffit_gttrain.log 2>&1
tail -2 results/r5_evidence/selffit_gttrain.log

echo "=== self-fit: gtfit (GT positions+colors, recover the rest) ==="
timeout 2400 python examples/self_fit.py --leg gtfit --steps 2000 \
  > results/r5_evidence/selffit_gtfit.log 2>&1
tail -2 results/r5_evidence/selffit_gtfit.log

echo "=== tracked-sequence codec rate ladder (rd_table) ==="
timeout 3600 python examples/compress_ply_sequence.py \
  --ply_dir results/dyn_stand_in/frames \
  --output_dir results/dyn_stand_in/seq_codec \
  --rate_points rp0 rp2 rp3 \
  --eval_views 3 --eval_width 324 --eval_height 210 \
  --eval_frame_stride 4 \
  > results/r5_evidence/seq_codec.log 2>&1
tail -5 results/r5_evidence/seq_codec.log
python - <<'EOF'
import json, os
rows = [{"phase": "train", "steps": 2000, "secs": 628.6,
         "psnr": 29.154, "ssim": 0.993,
         "note": "training leg from round 4 (dyn_benchmark.log)"}]
for rp in ["rp0", "rp2", "rp3"]:
    sp = os.path.join("results/dyn_stand_in/seq_codec", rp, "stats.json")
    if os.path.exists(sp):
        rows.append(json.load(open(sp)))
if len(rows) > 1:
    with open("results/dyn_stand_in/rd_table.json", "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
print(json.dumps(rows))
EOF

echo "=== exchange-cap sweep (trained garden ckpt) ==="
timeout 1800 python examples/exchange_cap_sweep.py \
  --splats results/garden_ladder_r4/cap_360000/ckpts/ckpt_4000.npz \
  --out results/r5_evidence/exchange_cap_sweep.json --n_views 8 \
  > results/r5_evidence/exchange_sweep.log 2>&1
tail -5 results/r5_evidence/exchange_sweep.log

echo "=== 2DGS trainer quality run (648x420) ==="
timeout 2400 python examples/benchmark_2dgs.py --steps 1200 \
  --result_dir results/garden_2dgs \
  > results/r5_evidence/benchmark_2dgs.log 2>&1
tail -3 results/r5_evidence/benchmark_2dgs.log

echo "=== bf16-packed quality A/B (short garden, same seed/recipe) ==="
rm -rf results/garden_ab_bf16 results/garden_ab_f32
timeout 1800 python examples/garden_benchmark.py --n_views 25 \
  --width 648 --height 420 --steps 1500 --cap 120000 --init_pts 60000 \
  --compression_sim --rd_lambda 0.01 \
  --grad_dtype bf16 --attr_dtype bf16 --log_composite \
  --result_dir results/garden_ab_bf16 \
  > results/r5_evidence/garden_ab_bf16.log 2>&1
tail -3 results/r5_evidence/garden_ab_bf16.log
timeout 1800 python examples/garden_benchmark.py --n_views 25 \
  --width 648 --height 420 --steps 1500 --cap 120000 --init_pts 60000 \
  --compression_sim --rd_lambda 0.01 \
  --grad_dtype f32 \
  --result_dir results/garden_ab_f32 \
  > results/r5_evidence/garden_ab_f32.log 2>&1
tail -3 results/r5_evidence/garden_ab_f32.log

echo "=== queue1 done ==="
