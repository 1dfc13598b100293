#!/bin/bash
# MPEG GSC video-anchor rate ladder (reference
# examples/benchmarks/mpeg/video_anchor_bench.sh rp0-rp3): compress a
# tracked .ply sequence at each rate point, decode, render, and report
# GSC metrics per point.
PLY_DIR="${PLY_DIR:?set PLY_DIR to a directory of tracked frame_*.ply}"
RESULT_DIR="${RESULT_DIR:-results/mpeg_anchor}"
python examples/compress_ply_sequence.py \
    --ply_dir "$PLY_DIR" --output_dir "$RESULT_DIR" \
    --rate_points rp0 rp1 rp2 rp3 --eval_views 4
python - << 'PY'
import glob, json, os
rows = []
for p in sorted(glob.glob(os.environ.get("RESULT_DIR", "results/mpeg_anchor") + "/rp*/stats.json")):
    rows.append(json.load(open(p)))
if rows:
    keys = ["rate_point", "bytes_per_frame", "psnr_rgb", "psnr_y", "ssim_y"]
    print(",".join(keys))
    for r in rows:
        print(",".join(str(round(r.get(k, float("nan")), 3)) if isinstance(r.get(k), float) else str(r.get(k)) for k in keys))
PY
