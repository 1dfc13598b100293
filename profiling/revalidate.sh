#!/bin/bash
# Hardware revalidation after a relay outage / kernel change: run each
# surface in sequence on the real chip (ONE process at a time — see
# .claude/skills/verify/SKILL.md). Logs land in /tmp/reval/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/reval

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout "${T:-1800}" "$@" > "/tmp/reval/$name.log" 2>&1
  rc=$?
  tail -5 "/tmp/reval/$name.log" | grep -v -i warning
  echo "--- $name rc=$rc"
}

run v2_check   python profiling/v2_check.py
run v2_stages  python profiling/v2_stages.py
run bench      python bench.py
T=3600 run trainer python examples/synthetic_benchmark.py \
  --steps 300 --n_gauss 20000 --width 512 --height 384 --n_views 12 \
  --cap 30000
