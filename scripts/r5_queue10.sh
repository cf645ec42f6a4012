#!/bin/bash
# Round-5 queue10: complete the 3x3 cross-class CFG MMD matrix at n=256
# (queue8 produced the per-class fake + held-out clouds; these legs only
# score the six off-diagonal cells -- chamfer on the chip, seconds each).
cd "$(dirname "$0")/.."
R5=artifacts/demo_round5
Q=$R5/queue.log
echo "=== r5 queue10 (cross-class n=256) start $(date -u +%H:%M:%S) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

for fake in cuboid prism cylinder; do
  for held in cuboid prism cylinder; do
    [ "$fake" = "$held" ] && continue
    leg "metrics_cf256_${fake}_vs_${held}" python scripts/demo_metrics.py \
      --run $R5/cf256 --cls "$fake" --vs "$held" \
      --samples_dir $R5/cf256/w0.6/$fake --heldout 256 --device tpu
  done
done

echo "=== r5 queue10 done $(date -u +%H:%M:%S) ===" >> "$Q"
