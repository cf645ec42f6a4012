#!/bin/bash
# Round-4 serial TPU queue (one jax process at a time on this backend —
# see CLAUDE.md). Run AFTER the all160k demo finishes. Each leg appends
# to its own artifact log; a leg's failure does not stop the queue.
cd "$(dirname "$0")/.."
R4=artifacts/demo_round4
Q=$R4/queue.log
echo "=== r4 queue start $(date -u +%H:%M:%S) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

# 1. quality metrics for the finished all160k run (CPU-forced jax)
leg metrics_all160k python scripts/demo_metrics.py \
  --run $R4/all160k --family all

# 2. VERDICT item 1: finish the compacted-bucket sweep + e2e compacted
#    cascades (writes artifacts/compact_bench_r4.log itself)
leg compact_sweep bash scripts/compact_sweep_r4.sh

# 3. VERDICT item 2: d768 six-stage training throughput
#    (writes artifacts/train_tp_r4.log itself)
leg train_throughput bash scripts/train_throughput_r4.sh

# 4. VERDICT item 4: class-conditional (CFG) quality run
leg cf160k bash scripts/run_with_retry.sh $R4/cf160k.log \
  python scripts/train_synthetic_demo.py --cf --resume \
  --surfpos_steps 40000 --pos_steps 40000 --edge_steps 40000 \
  --out $R4/cf160k

# 5. per-class CFG fidelity metrics
for cls in cuboid prism cylinder; do
  leg "metrics_cf_$cls" python scripts/demo_metrics.py \
    --run $R4/cf160k --cls "$cls"
done

# 6. VERDICT item 5: the reference eval protocol once at full scale
leg protocol_scale bash scripts/run_with_retry.sh $R4/protocol_scale.log \
  python scripts/protocol_scale_r4.py --run $R4/all160k

echo "=== r4 queue done $(date -u +%H:%M:%S) ===" >> "$Q"
