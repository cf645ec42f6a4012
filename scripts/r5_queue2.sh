#!/bin/bash
# Round-5 follow-up queue — runs AFTER r5_queue.sh exits (serial TPU use,
# CLAUDE.md one-jax-process rule). Picks up what the first queue lost to
# the two bugs fixed at e61a660 and adds the measured cached-surfz leg:
#   1. cf_pack retry (cross-device orbax unpack now falls back to a
#      local-device abstract target)
#   2. cross-class MMD matrix on the cf_guidance w=0.6 samples (the
#      cf160k samples the first queue scored were truncated at 9 cuboids
#      by the UnboundLocalError; w0.6 is the reference guidance weight)
#   3. surfz@256 --cache_latents throughput leg: the recipe trains surfz
#      without --data_aug (reference train_ldm.sh), so hoisting the
#      frozen-VAE encodes off the step is recipe-sound; surfz is 150.7 of
#      the 663.7 recipe chip-hours at 4% MFU because those encodes
#      dominate its step — measure the cached steps/s for BASELINE.md.
cd "$(dirname "$0")/.."
R5=artifacts/demo_round5
Q=$R5/queue2.log
echo "=== r5 queue2 start $(date -u +%H:%M:%S) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

# ---- 1. committable CFG checkpoint ----
leg cf_pack python scripts/pack_ckpt.py $R5/cf160k/ckpt $R5/cf160k/ckpt_packed

# ---- 2. cross-class MMD matrix at the reference guidance weight ----
for cls in cuboid prism cylinder; do
  for vs in cuboid prism cylinder; do
    if [ "$vs" != "$cls" ]; then
      leg "metrics_w0.6_${cls}_vs_${vs}" python scripts/demo_metrics.py \
        --run $R5/cf_guidance --cls "$cls" --vs "$vs" \
        --samples_dir $R5/cf_guidance/w0.6/${cls}
    fi
  done
done

# ---- 3. cached-surfz training-throughput leg ----
STUBS=/tmp/tp_r5/vae_stubs
if [ ! -d "$STUBS" ]; then
  leg prep python scripts/tp_prep_r4.py "$STUBS"
fi
leg surfz_cached bash scripts/run_with_retry.sh /tmp/tp_r5/stage2.log \
  python ldm.py --option surfz --batch_size 256 --cache_latents \
  --train_nepoch 80 --env tp_surfz_cached \
  --synthetic 1024 --max_face 30 --max_edge 20 --bf16 --num_workers 0 \
  --test_nepoch 9999 --save_nepoch 9999 --dir_name /tmp/tp_r5/proj \
  --surfvae "$STUBS/surfvae" --edgevae "$STUBS/edgevae"
cat /tmp/tp_r5/stage2.log >> "$Q" 2>/dev/null

# ---- 4. selective-remat edgez leg (--remat dots): save Dense outputs,
# recompute only elementwise + attention. Directly comparable to the
# r5 sweep's full-remat edgez@128 leg (1.43 steps/s); if the saved dots
# overflow HBM this OOMs, rc!=0, and full remat stays the auto default.
leg edgez_dots bash scripts/run_with_retry.sh /tmp/tp_r5/stage3.log \
  python ldm.py --option edgez --batch_size 128 --cache_latents \
  --remat dots --train_nepoch 40 --env tp_edgez_dots \
  --synthetic 1024 --max_face 30 --max_edge 20 --bf16 --num_workers 0 \
  --test_nepoch 9999 --save_nepoch 9999 --dir_name /tmp/tp_r5/proj \
  --surfvae "$STUBS/surfvae" --edgevae "$STUBS/edgevae"
cat /tmp/tp_r5/stage3.log >> "$Q" 2>/dev/null

echo "=== r5 queue2 done $(date -u +%H:%M:%S) ===" >> "$Q"
