#!/bin/bash
# Round-4 queue, continuation (the first queue died with the session at
# the compact-sweep leg; metrics_all160k and the @64 compaction timings
# are already banked). Ordered by VERDICT-r3 value:
#   1. resample with the v3 recovery ladder (item 3 -- the pre-v3 on-chip
#      runs recovered 0/19; the offline replay now rescues all 19)
#   2. quality metrics over the recovered sample set (before/after)
#   3. remaining compaction timings @80 + e2e compacted cascades (item 1)
#   4. d768 six-stage training throughput (item 2)
#   5. protocol-scale eval (item 5)
#   6. class-conditional CFG demo + per-class metrics (item 4)
# One jax process at a time on this backend (CLAUDE.md).
cd "$(dirname "$0")/.."
R4=artifacts/demo_round4
Q=$R4/queue2.log
echo "=== r4 queue2 start $(date -u +%H:%M:%S) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

# 1. VERDICT item 3: on-chip resample with the v3 recovery ladder
leg resample_v3 bash scripts/run_with_retry.sh $R4/resample_v3.log \
  python scripts/resample_demo.py --ckpt $R4/all160k/ckpt \
  --out $R4/resample_v3 --z_thresholds 0.2 --recover

# 2. quality metrics over the recovered set (demo_metrics reads
#    run/samples; point it at the z0.2 output via symlink)
ln -sfn z0.2 $R4/resample_v3/samples
leg metrics_recovered python scripts/demo_metrics.py \
  --run $R4/resample_v3 --family all

# 3. VERDICT item 1: remaining compaction timings + e2e compacted
LOG=artifacts/compact_bench_r4.log
for spec in edgepos@80 edgez@80; do
  echo "=== time:$spec ===" >> "$LOG"
  leg "compact_$spec" bash scripts/run_with_retry.sh /tmp/compact_r4_stage.log \
    python scripts/bench_cascade.py abc pallas '' "time:$spec" 3
  cat /tmp/compact_r4_stage.log >> "$LOG"
done
for spec in "abc 48" "deepcad 32"; do
  set -- $spec
  echo "=== e2e compacted: $1 @$2 ===" >> "$LOG"
  leg "compact_e2e_$1" \
    env "BREPGEN_BENCH_COMPACT=$2" bash scripts/run_with_retry.sh \
    /tmp/compact_r4_stage.log python scripts/bench_cascade.py "$1" pallas
  cat /tmp/compact_r4_stage.log >> "$LOG"
done
echo "=== sweep complete ===" >> "$LOG"

# 4. VERDICT item 2: d768 six-stage training throughput
leg train_throughput bash scripts/train_throughput_r4.sh

# 5. VERDICT item 5: the reference eval protocol once at full scale
leg protocol_scale bash scripts/run_with_retry.sh $R4/protocol_scale.log \
  python scripts/protocol_scale_r4.py --run $R4/all160k

# 6. VERDICT item 4: class-conditional (CFG) quality run
leg cf160k bash scripts/run_with_retry.sh $R4/cf160k.log \
  python scripts/train_synthetic_demo.py --cf --resume \
  --surfpos_steps 40000 --pos_steps 40000 --edge_steps 40000 \
  --out $R4/cf160k
for cls in cuboid prism cylinder; do
  leg "metrics_cf_$cls" python scripts/demo_metrics.py \
    --run $R4/cf160k --cls "$cls"
done

echo "=== r4 queue2 done $(date -u +%H:%M:%S) ===" >> "$Q"
