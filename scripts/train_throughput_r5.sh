#!/bin/bash
# Round-5 continuation of the d768 training-throughput sweep: the two
# legs the round-4 sweep died before reaching (edgez@128, surfpos) plus a
# re-leg of surf_vae@512 WITH --data_aug (ADVICE r4: train_vae.sh trains
# with augmentation, the r4 leg omitted it). Fixes vs r4:
#   * surfpos runs at batch 512 — the reference's actual batch
#     (train_ldm.sh passes no --batch_size; utils.py:189 defaults 512);
#     r4's surfpos@256 leg never ran, so nothing is superseded.
#   * surfpos drops --data_aug (train_ldm.sh passes no --data_aug).
# Results append to artifacts/train_tp_r5.log; project the merged sweep:
#   python scripts/tp_project_r4.py artifacts/train_tp_r4.log artifacts/train_tp_r5.log
# (later logs' sections replace earlier ones, so the aug'd surf_vae@512
# supersedes r4's un-aug'd leg).
cd "$(dirname "$0")/.."
LOG=artifacts/train_tp_r5.log
: > "$LOG"
STUBS=/tmp/tp_r5/vae_stubs
PROJ=/tmp/tp_r5/proj
rm -rf /tmp/tp_r5 && mkdir -p /tmp/tp_r5

run() {
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  bash scripts/run_with_retry.sh /tmp/tp_r5/stage.log "$@"
  cat /tmp/tp_r5/stage.log >> "$LOG"
}

run prep python scripts/tp_prep_r4.py "$STUBS"

COMMON="--synthetic 1024 --max_face 30 --max_edge 20 --bf16 --num_workers 0
        --test_nepoch 9999 --save_nepoch 9999 --dir_name $PROJ
        --surfvae $STUBS/surfvae --edgevae $STUBS/edgevae"

run edgez@128 python ldm.py --option edgez --batch_size 128 \
  --cache_latents --train_nepoch 40 --env tp_edgez $COMMON

run surfpos@512 python ldm.py --option surfpos --batch_size 512 \
  --train_nepoch 160 --env tp_surfpos $COMMON

run surf_vae@512 python vae.py --option surface --synthetic 1024 \
  --batch_size 512 --bf16 --data_aug --train_nepoch 120 --test_nepoch 500 \
  --save_nepoch 500 --env tp_surfvae_aug --dir_name "$PROJ"

mkdir -p artifacts/train_tp_r5_logs
find "$PROJ" -name "*.jsonl" -exec cp {} artifacts/train_tp_r5_logs/ \;

echo "=== sweep complete ===" | tee -a "$LOG"
