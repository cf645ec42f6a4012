#!/bin/bash
# Round-5 queue9: verify the chained-proximity-merge ladder fix end-to-end
# by re-postprocessing the SAME held-out-family dump (batches.npz) that
# produced the 127/128 (99.2%) row — the one failure was 'endpoint 9 in
# multiple groups'. Then rescore + conformance-audit the new exports.
cd "$(dirname "$0")/.."
R5=artifacts/demo_round5
Q=$R5/queue.log
echo "=== r5 queue9 (ladder-fix verify) start $(date -u +%H:%M:%S) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

leg held_fix bash scripts/run_with_retry.sh $R5/held_resample_fix.log \
  python scripts/resample_demo.py --ckpt $R5/held160k/ckpt \
  --out $R5/held_resample_fix --sample_batches 8 --z_thresholds 0.2 \
  --recover --from_dump $R5/held_resample/batches.npz
ln -sfn z0.2 $R5/held_resample_fix/samples
leg metrics_held_fix python scripts/demo_metrics.py \
  --run $R5/held_resample_fix --family heldout --heldout 128 --device tpu
leg held_fix_conformance bash -c '
  find '"$R5"'/held_resample_fix -name "*.step" 2>/dev/null | sort > /tmp/r5_heldfix_steps.txt
  wc -l /tmp/r5_heldfix_steps.txt
  xargs -a /tmp/r5_heldfix_steps.txt \
    python -m brepgen_tpu.geometry.step_conformance \
    > '"$R5"'/conformance_audit_held_fix.txt 2>&1
  rc=$?
  grep -c ": CONFORMANT" '"$R5"'/conformance_audit_held_fix.txt
  exit $rc'

echo "=== r5 queue9 done $(date -u +%H:%M:%S) ===" >> "$Q"
