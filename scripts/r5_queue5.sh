#!/bin/bash
# Round-5 queue, part 5 (chains after r5_queue4.sh).
# Raises the statistical power of the CFG tables to n=256 (mirroring what
# queue4's resample256 does for the unconditional run), loading from the
# COMMITTED packed npz checkpoints — which doubles as the fresh-clone
# reproduction proof for BASELINE.md's "Reproducing the quality tables".
# Then: conformance audit over every export written by the FIXED writer,
# rung-ablation replays on the n=256 dump, and a full pytest run so the
# round ends on a verified-green suite.
cd "$(dirname "$0")/.."
R5=artifacts/demo_round5
Q=$R5/queue.log

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== r5 queue5 start $(date -u +%H:%M:%S) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

# ---- 1. CFG at n=256/class, w=0.6, from the COMMITTED packed ckpts ----
leg cf256 bash scripts/run_with_retry.sh $R5/cf256.log \
  python scripts/resample_demo.py --cf \
  --ckpt $R5/cf160k/ckpt_packed --out $R5/cf256 \
  --z_thresholds 0.2 --recover --dump --cfg_weights 0.6 \
  --sample_batches 16

# ---- 2. per-class within-class quality at n=256 (chip-scored) ----
for cls in cuboid prism cylinder; do
  leg "metrics_cf256_$cls" python scripts/demo_metrics.py \
    --run $R5/cf256 --cls "$cls" \
    --samples_dir $R5/cf256/w0.6/$cls --heldout 256 --device tpu
done

# ---- 3. conformance audit: every export written by the fixed writer ----
# (pure host python, no jax; rc=1 if any file is non-conformant)
leg conformance_postfix bash -c '
  find '"$R5"'/resample256 '"$R5"'/resample256_strict '"$R5"'/held_resample \
       '"$R5"'/cf256 -name "*.step" 2>/dev/null | sort > /tmp/r5_postfix_steps.txt
  wc -l /tmp/r5_postfix_steps.txt
  xargs -a /tmp/r5_postfix_steps.txt \
    python -m brepgen_tpu.geometry.step_conformance \
    > '"$R5"'/conformance_audit_postfix.txt 2>&1
  rc=$?
  grep -c ": CONFORMANT" '"$R5"'/conformance_audit_postfix.txt
  exit $rc'

# ---- 4. rung-ablation replays on the n=256 unconditional dump ----
for abl in "" "--strict" "--ablate 6" "--ablate 5" "--ablate 4"; do
  leg "r256_replay${abl// /_}" python scripts/replay_postprocess.py \
    $R5/resample256/batches.npz $abl
done

# ---- 5. full test suite (CPU, 8 virtual devices via conftest) ----
leg pytest python -m pytest tests/ -q

# ---- 6. optional n=256 cross-class spot checks (largest contrasts) ----
leg metrics_cf256_cylinder_vs_cuboid python scripts/demo_metrics.py \
  --run $R5/cf256 --cls cylinder --vs cuboid \
  --samples_dir $R5/cf256/w0.6/cylinder --heldout 256 --device tpu
leg metrics_cf256_prism_vs_cuboid python scripts/demo_metrics.py \
  --run $R5/cf256 --cls prism --vs cuboid \
  --samples_dir $R5/cf256/w0.6/prism --heldout 256 --device tpu

echo "=== r5 queue5 done $(date -u +%H:%M:%S) ===" >> "$Q"
