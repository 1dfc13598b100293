#!/bin/bash
# Round-5 queue 5: diagnose the geom_dtype=u16 bench legs that failed
# silently in the sweep (stderr was discarded), with stderr captured.
set -x
cd "$(dirname "$0")/.."
[ -n "$1" ] || { echo "usage: $0 <pid-to-wait-for>"; exit 1; }
while kill -0 "$1" 2>/dev/null; do sleep 10; done
GSC_BENCH_TILE=32 GSC_BENCH_GEOM_DTYPE=u16 GSC_BENCH_AUTO_CAP=1 \
  timeout 1200 python bench.py \
  > results/r5_evidence/bench_u16_debug.log 2>&1
tail -30 results/r5_evidence/bench_u16_debug.log
echo "=== queue5 done ==="
