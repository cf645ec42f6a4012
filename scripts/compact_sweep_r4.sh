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
echo "=== sweep complete ===" >> "$LOG"
