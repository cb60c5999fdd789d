#!/bin/bash
# One-shot TPU measurement runbook: every number the docs track, in the
# order of decision value.  Run when a hardware window is open; each step
# is independently timeout-bounded so one hang doesn't block the rest.
#
#   bash scripts/measure_all.sh [outdir]
#
# Decisions the outputs feed (docs/DESIGN.md §4, BASELINE.md):
# 1. bench_subpixel full-model end-to-end   -> decoder_subpixel serving
#    default (flip ModelConfig default + bench.py if the recast wins)
# 2. bench.py                               -> headline stamps/s
# 3. bench_detect / profile_detect_core     -> detect core regression watch
# 4. bench_field4k                          -> 4k/8k steady rows (now with
#    the COO-native host postprocess — expect merge/segstats shares down
#    ~5x vs the r3 rows recorded before it)
set -u
OUT=${1:-/tmp/measure_$(date -u +%Y%m%dT%H%M)}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name ($*)" | tee -a "$OUT/summary.txt"
  timeout 1200 "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -15 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
  echo "--- rc=$rc" | tee -a "$OUT/summary.txt"
}

run subpixel    python scripts/bench_subpixel.py
run bench       python bench.py
run detect      python scripts/bench_detect.py
run detect_prof python scripts/profile_detect_core.py
run field4k     python scripts/bench_field4k.py

echo "All logs in $OUT"
