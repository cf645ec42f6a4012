#!/bin/bash
# d768 production-width training throughput, all six stages, reference
# batch sizes (train_vae.sh / train_ldm.sh deepcad recipe), through the
# REAL CLIs on the real chip: batched assembly + background prefetch +
# --remat auto (default) + --cache_latents on the latent stages.
# One process per stage (one jax process at a time on this backend).
# Steps/s comes from the 100-step ms/step windows the CLIs now print.
cd "$(dirname "$0")/.."
LOG=artifacts/train_tp_r4.log
: > "$LOG"
STUBS=/tmp/tp_r4/vae_stubs
PROJ=/tmp/tp_r4/proj
rm -rf /tmp/tp_r4 && mkdir -p /tmp/tp_r4

run() {
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  bash scripts/run_with_retry.sh /tmp/tp_r4/stage.log "$@"
  cat /tmp/tp_r4/stage.log >> "$LOG"
}

run prep python scripts/tp_prep_r4.py "$STUBS"

COMMON="--synthetic 1024 --max_face 30 --max_edge 20 --bf16 --num_workers 0
        --test_nepoch 9999 --save_nepoch 9999 --dir_name $PROJ
        --surfvae $STUBS/surfvae --edgevae $STUBS/edgevae"

# never-measured stages first (the round can end mid-sweep; surfpos and
# edgez d768 steps/s already exist from round 3 as a fallback).
# Step budgets: >=320 steps/stage = 2+ steady 100-step windows past the
# compile window -- enough for an honest steady-state ms/step without
# burning the round's remaining chip time on repeats.
run edgepos@128 python ldm.py --option edgepos --batch_size 128 \
  --cache_latents --train_nepoch 40 --env tp_edgepos $COMMON

run surfz@256 python ldm.py --option surfz --batch_size 256 \
  --cache_latents --train_nepoch 80 --env tp_surfz $COMMON

run surf_vae@512 python vae.py --option surface --synthetic 1024 \
  --batch_size 512 --bf16 --train_nepoch 120 --test_nepoch 500 \
  --save_nepoch 500 --env tp_surfvae --dir_name "$PROJ"

run edge_vae@512 env BREPGEN_TP_STEPS=300 python scripts/tp_edge_vae_r4.py

run edgez@128 python ldm.py --option edgez --batch_size 128 \
  --cache_latents --train_nepoch 40 --env tp_edgez $COMMON

run surfpos@256 python ldm.py --option surfpos --batch_size 256 \
  --data_aug --train_nepoch 80 --env tp_surfpos $COMMON

# preserve the loss curves (MetricsLogger JSONL) as round evidence
mkdir -p artifacts/train_tp_r4_logs
find "$PROJ" -name "*.jsonl" -exec cp {} artifacts/train_tp_r4_logs/ \;

echo "=== sweep complete ===" | tee -a "$LOG"
