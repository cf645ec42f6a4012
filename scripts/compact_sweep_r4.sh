#!/bin/bash
# Round-4 completion of the compacted-bucket edge-stage sweep
# (round 3 died at edgepos@64). One process per timing: the tunneled
# backend's device lease can't fit chained ABC-scale compiles.
cd "$(dirname "$0")/.."
LOG=artifacts/compact_bench_r4.log
: > "$LOG"
for spec in edgepos@64 edgez@64 edgepos@80 edgez@80; do
  echo "=== time:$spec ===" >> "$LOG"
  bash scripts/run_with_retry.sh /tmp/compact_r4_stage.log \
    python scripts/bench_cascade.py abc pallas '' "time:$spec" 3
  cat /tmp/compact_r4_stage.log >> "$LOG"
done

# End-to-end compacted cascades with the edge stages forced onto a
# production-representative bucket (reference dedup keeps ~30-60 of 100
# ABC face slots, sample.py:159-183; deepcad ~<=30 of 60). Random weights
# dedup nothing, so BREPGEN_BENCH_COMPACT forces the bucket; compute cost
# is mask-independent at fixed shapes (see bench_cascade.py).
for spec in "abc 48" "deepcad 32"; do
  set -- $spec
  echo "=== e2e compacted: $1 @$2 ===" >> "$LOG"
  BREPGEN_BENCH_COMPACT=$2 bash scripts/run_with_retry.sh /tmp/compact_r4_stage.log \
    python scripts/bench_cascade.py "$1" pallas
  cat /tmp/compact_r4_stage.log >> "$LOG"
done
echo "=== sweep complete ===" >> "$LOG"
