#!/bin/bash
# Round-5 serial TPU queue — one jax process at a time on this backend
# (CLAUDE.md). Ordered by VERDICT-r4 priority:
#   1. finish the d768 training-throughput sweep (item 2) + projection
#   2. CFG conditional demo at 40k steps/stage (item 1 — the r4 casualty)
#      + per-class & cross-class metrics + guidance sweep w in {0,0.6,1.2}
#   3. uncond mixed-family 160k retrain + PACKED COMMITTABLE checkpoints
#      (item 3) + n=256 re-score strict vs recovered (item 4)
#   4. held-out-family (lblock/frustum) train + recovery-ladder
#      generalization evidence (item 5)
#   5. 161k-scale input-pipeline drill (item 8)
# Every leg appends to $Q; a leg's failure does not stop the queue.
cd "$(dirname "$0")/.."
R5=artifacts/demo_round5
mkdir -p $R5
Q=$R5/queue.log
echo "=== r5 queue start $(date -u +%H:%M:%S) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

# ---- 1. training-throughput sweep completion + projection ----
leg tp_sweep_r5 bash scripts/train_throughput_r5.sh
leg tp_project python scripts/tp_project_r4.py \
  artifacts/train_tp_r4.log artifacts/train_tp_r5.log

# ---- 2. CFG conditional demo (VERDICT item 1) ----
leg cf160k bash scripts/run_with_retry.sh $R5/cf160k.log \
  python scripts/train_synthetic_demo.py --cf --resume \
  --surfpos_steps 40000 --pos_steps 40000 --edge_steps 40000 \
  --out $R5/cf160k
leg cf_pack python scripts/pack_ckpt.py $R5/cf160k/ckpt $R5/cf160k/ckpt_packed

# per-class (within) + cross-class MMD matrix (CPU-forced jax)
for cls in cuboid prism cylinder; do
  leg "metrics_cf_${cls}" python scripts/demo_metrics.py \
    --run $R5/cf160k --cls "$cls"
  for vs in cuboid prism cylinder; do
    if [ "$vs" != "$cls" ]; then
      leg "metrics_cf_${cls}_vs_${vs}" python scripts/demo_metrics.py \
        --run $R5/cf160k --cls "$cls" --vs "$vs"
    fi
  done
done

# guidance sweep: per-(class, w) validity/face-count + quality
leg cf_guidance bash scripts/run_with_retry.sh $R5/cf_guidance.log \
  python scripts/resample_demo.py --cf --ckpt $R5/cf160k/ckpt \
  --out $R5/cf_guidance --z_thresholds 0.2 --recover \
  --cfg_weights 0 0.6 1.2
for w in 0 0.6 1.2; do
  for cls in cuboid prism cylinder; do
    leg "metrics_w${w}_${cls}" python scripts/demo_metrics.py \
      --run $R5/cf_guidance --cls "$cls" \
      --samples_dir $R5/cf_guidance/w${w}/${cls}
  done
done

# ---- 3. uncond mixed-family 160k retrain (items 3+4) ----
leg all160k bash scripts/run_with_retry.sh $R5/all160k.log \
  python scripts/train_synthetic_demo.py --resume \
  --surfpos_steps 40000 --pos_steps 40000 --edge_steps 40000 \
  --out $R5/all160k
leg all_pack python scripts/pack_ckpt.py \
  $R5/all160k/ckpt $R5/all160k/ckpt_packed

# n=256 protocol: 16 batches, recovered + strict from the SAME dump
leg resample256 bash scripts/run_with_retry.sh $R5/resample256.log \
  python scripts/resample_demo.py --ckpt $R5/all160k/ckpt \
  --out $R5/resample256 --sample_batches 16 --z_thresholds 0.2 \
  --recover --dump
leg resample256_strict python scripts/resample_demo.py \
  --ckpt $R5/all160k/ckpt --out $R5/resample256_strict \
  --from_dump $R5/resample256/batches.npz --sample_batches 16 \
  --z_thresholds 0.2
ln -sfn z0.2 $R5/resample256/samples
ln -sfn z0.2 $R5/resample256_strict/samples
leg metrics_n256_recovered python scripts/demo_metrics.py \
  --run $R5/resample256 --family all --heldout 256
leg metrics_n256_strict python scripts/demo_metrics.py \
  --run $R5/resample256_strict --family all --heldout 256

# ---- 4. held-out family: ladder generalization (item 5) ----
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
  --run $R5/held_resample --family heldout --heldout 128
# rung ablations replay offline from the dump (pure numpy, no jax)
for abl in "" "--strict" "--ablate 6" "--ablate 5" "--ablate 4"; do
  leg "held_replay${abl// /_}" python scripts/replay_postprocess.py \
    $R5/held_resample/batches.npz $abl
done

# ---- 5. 161k-scale input-pipeline drill (item 8) ----
leg drill bash scripts/drill_161k_r5.sh

echo "=== r5 queue done $(date -u +%H:%M:%S) ===" >> "$Q"
