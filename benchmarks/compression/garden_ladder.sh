#!/bin/bash
# Garden stand-in quality/rate ladder (the TanksAndTemples.csv analog in
# this dataset-free environment): the full production pipeline (MCMC cap
# + compression sim + entropy models + ada mask + PNG codec) at several
# capacity operating points; each emits PSNR/SSIM + compressed bytes.
RESULT_DIR="${RESULT_DIR:-results/garden_ladder}"
STEPS="${STEPS:-8000}"
for CAP in 360000 490000 1000000; do
    echo "=== cap $CAP ==="
    python examples/garden_benchmark.py \
        --steps "$STEPS" --cap "$CAP" \
        --compression_sim --rd_lambda 0.01 \
        --result_dir "$RESULT_DIR/cap_$CAP"
done
python - << 'PY'
import glob, json, os
root = os.environ.get("RESULT_DIR", "results/garden_ladder")
print("cap,psnr,ssim,size_bytes")
for p in sorted(glob.glob(root + "/cap_*/stats.json")):
    d = json.load(open(p))
    tr, co = d.get("train", {}), d.get("compression", {})
    print(f"{d['config']['cap']},{tr.get('psnr')},{tr.get('ssim')},{co.get('size_bytes')}")
PY
