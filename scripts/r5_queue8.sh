#!/bin/bash
# Round-5 optional tail: n=256-per-class CFG legs, sampled from the
# COMMITTED packed checkpoints (also the fresh-clone reproduction proof
# for BASELINE.md's CFG tables). Runs after queue7's green pytest.
cd "$(dirname "$0")/.."
R5=artifacts/demo_round5
Q=$R5/queue.log
echo "=== r5 queue8 (cf256) start $(date -u +%H:%M:%S) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

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

echo "=== r5 queue8 done $(date -u +%H:%M:%S) ===" >> "$Q"
