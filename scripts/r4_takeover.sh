#!/bin/bash
# Round-4 takeover queue. Adopts the in-flight abc e2e compacted bench
# (PID $1), salvages its output, then runs the remaining legs in the
# reordered priority from r4_queue3.sh: deepcad e2e -> protocol-scale
# eval (VERDICT item 5, ~25 min, completes outright) -> d768 training
# throughput (item 2, banks per-stage results incrementally) -> CFG demo
# (item 4, only if time somehow remains).
# One jax process at a time on this backend (CLAUDE.md).
cd "$(dirname "$0")/.."
ABC_PID="$1"
R4=artifacts/demo_round4
Q=$R4/queue3.log
LOG=artifacts/compact_bench_r4.log
echo "=== r4 takeover start $(date -u +%H:%M:%S) (adopting pid $ABC_PID) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

# 0. adopt the running abc@48 e2e bench; its stdout goes to
# /tmp/compact_r4_stage.log (truncated once by a stray deepcad launch --
# strip NULs when salvaging)
while kill -0 "$ABC_PID" 2>/dev/null; do sleep 20; done
echo "--- abc e2e pid $ABC_PID exited $(date -u +%H:%M:%S) ---" >> "$Q"
tr -d '\000' < /tmp/compact_r4_stage.log >> "$LOG"
if ! grep -q breps_per_min_chip /tmp/compact_r4_stage.log; then
  echo "=== e2e compacted: abc @48 (retry) ===" >> "$LOG"
  leg compact_e2e_abc_retry \
    env BREPGEN_BENCH_COMPACT=48 bash scripts/run_with_retry.sh \
    /tmp/compact_r4_stage.log python scripts/bench_cascade.py abc pallas
  cat /tmp/compact_r4_stage.log >> "$LOG"
fi

# 1. deepcad e2e compacted @32
echo "=== e2e compacted: deepcad @32 ===" >> "$LOG"
leg compact_e2e_deepcad \
  env BREPGEN_BENCH_COMPACT=32 bash scripts/run_with_retry.sh \
  /tmp/compact_r4_stage.log python scripts/bench_cascade.py deepcad pallas
cat /tmp/compact_r4_stage.log >> "$LOG"
echo "=== sweep complete ===" >> "$LOG"

# 2. VERDICT item 5: the reference eval protocol once at full scale
leg protocol_scale bash scripts/run_with_retry.sh $R4/protocol_scale.log \
  python scripts/protocol_scale_r4.py --run $R4/all160k

# 3. VERDICT item 2: d768 six-stage training throughput
leg train_throughput bash scripts/train_throughput_r4.sh

# 4. VERDICT item 4: class-conditional (CFG) quality run (if time remains)
leg cf160k bash scripts/run_with_retry.sh $R4/cf160k.log \
  python scripts/train_synthetic_demo.py --cf --resume \
  --surfpos_steps 40000 --pos_steps 40000 --edge_steps 40000 \
  --out $R4/cf160k
for cls in cuboid prism cylinder; do
  leg "metrics_cf_$cls" python scripts/demo_metrics.py \
    --run $R4/cf160k --cls "$cls"
done

echo "=== r4 takeover done $(date -u +%H:%M:%S) ===" >> "$Q"
