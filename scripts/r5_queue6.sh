#!/bin/bash
# Round-5 takeover queue (replaces the queue4 throughput tail + queue5):
# with ~2.5h of round left, only the highest-value legs fit. Launched
# manually after queue4's held-family legs land and its shell + queue5's
# waiting shell are killed.
#   1. 161k-scale input-pipeline drill (VERDICT r4 item 8) — TPU.
#   2. cf256 n=256 CFG leg from the COMMITTED packs — only if the clock
#      allows (doubles as the fresh-clone reproduction proof).
#   3. full pytest (CPU) — round ends on a verified-green suite and
#      validates the compact-by-default CLI change.
cd "$(dirname "$0")/.."
R5=artifacts/demo_round5
Q=$R5/queue.log
echo "=== r5 queue6 (takeover) start $(date -u +%H:%M:%S) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

leg drill bash scripts/drill_161k_r5.sh

# cf256 only if there is still >55 min of budget before the expected
# driver bench window (21:10 UTC cutoff chosen from the round-5 clock).
if [ "$(date -u +%H%M)" -lt "${CF256_CUTOFF:-2040}" ]; then
  leg cf256 bash scripts/run_with_retry.sh $R5/cf256.log \
    python scripts/resample_demo.py --cf \
    --ckpt $R5/cf160k/ckpt_packed --out $R5/cf256 \
    --z_thresholds 0.2 --recover --dump --cfg_weights 0.6 \
    --sample_batches 16
  for cls in cuboid prism cylinder; do
    leg "metrics_cf256_$cls" python scripts/demo_metrics.py \
      --run $R5/cf256 --cls "$cls" \
      --samples_dir $R5/cf256/w0.6/$cls --heldout 256 --device tpu
  done
else
  echo "--- cf256 SKIPPED (past cutoff) ---" >> "$Q"
fi

leg pytest python -m pytest tests/ -q
echo "=== r5 queue6 done $(date -u +%H:%M:%S) ===" >> "$Q"
