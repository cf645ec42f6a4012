#!/bin/bash
# Round-5 final takeover queue (this session): the two VERDICT-r4 items
# still open after the mid-round session reset killed queue4 at the
# held160k leg, then a full-suite verification.
#   1. 161k-scale input-pipeline drill (VERDICT r4 item 8) — never ran.
#   2. held-out-family retrain + ladder replays (item 5's second half;
#      the rung-ablation matrix already landed at n=256).
#   3. full pytest (CPU) — no full-suite run is on record this round and
#      the writer/ladder fixes since deserve a green stamp.
# Strictly serial: one jax process at a time (axon backend contention).
cd "$(dirname "$0")/.."
R5=artifacts/demo_round5
Q=$R5/queue.log
echo "=== r5 queue7 (final takeover) start $(date -u +%H:%M:%S) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

# ---- 1. 161k-scale input-pipeline drill (item 8) ----
leg drill bash scripts/drill_161k_r5.sh

# ---- 2. held-out family: ladder generalization (item 5) ----
leg held160k bash scripts/run_with_retry.sh $R5/held160k.log \
  python scripts/train_synthetic_demo.py --family heldout --resume \
  --surfpos_steps 40000 --pos_steps 40000 --edge_steps 40000 \
  --out $R5/held160k
leg held_pack python scripts/pack_ckpt.py \
  $R5/held160k/ckpt $R5/held160k/ckpt_packed
leg held_resample bash scripts/run_with_retry.sh $R5/held_resample.log \
  python scripts/resample_demo.py --ckpt $R5/held160k/ckpt \
  --out $R5/held_resample --sample_batches 8 --z_thresholds 0.2 \
  --recover --dump
ln -sfn z0.2 $R5/held_resample/samples
leg metrics_held python scripts/demo_metrics.py \
  --run $R5/held_resample --family heldout --heldout 128 --device tpu
# rung ablations replay offline from the dump (pure numpy, no jax)
for abl in "" "--strict" "--ablate 6" "--ablate 5" "--ablate 4"; do
  leg "held_replay${abl// /_}" python scripts/replay_postprocess.py \
    $R5/held_resample/batches.npz $abl
done
# conformance over the held-out-family exports (pure host python)
leg held_conformance bash -c '
  find '"$R5"'/held_resample -name "*.step" 2>/dev/null | sort > /tmp/r5_held_steps.txt
  wc -l /tmp/r5_held_steps.txt
  xargs -a /tmp/r5_held_steps.txt \
    python -m brepgen_tpu.geometry.step_conformance \
    > '"$R5"'/conformance_audit_held.txt 2>&1
  rc=$?
  grep -c ": CONFORMANT" '"$R5"'/conformance_audit_held.txt
  exit $rc'

# ---- 3. full test suite (CPU, 8 virtual devices via conftest) ----
leg pytest python -m pytest tests/ -q

echo "=== r5 queue7 done $(date -u +%H:%M:%S) ===" >> "$Q"
