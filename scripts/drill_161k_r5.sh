#!/bin/bash
# 161k-scale input-pipeline drill (VERDICT r4 item 8): a ~10k-solid pkl
# tree in the reference sharded layout, CAD-deduped through the real
# dedup CLI, then full epochs of surfpos@512 and edgez@128 through the
# real training CLIs (batched assembly + background prefetch +
# --cache_latents on edgez). Pass criterion: sustained steps/s within
# ~10% of the 320-step synthetic probes (train_tp_r4/r5.log); any gap is
# a host stall in the at-scale input path (pkl IO, filter, assembly).
cd "$(dirname "$0")/.."
LOG=artifacts/drill_r5.log
: > "$LOG"
ROOT=/tmp/drill_r5
# stubs live OUTSIDE the tree root so a tree rebuild doesn't redo the
# ~10 min stub prep
STUBS=/tmp/drill_stubs
# 12k default (two reference-convention shards): the drill's pass
# criterion is steps/s parity with the synthetic probes, which saturates
# well below 161k items; keeps the serial round-5 queue clear of the
# driver's end-of-round bench window
N=${BREPGEN_DRILL_N:-12000}

say() { echo "=== $1 ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"; }

say "tree n=$N"
rm -rf "$ROOT" && mkdir -p "$ROOT"
# shard_size MUST be 10000: uid_to_path (cli/build.py) re-derives the
# shard from the numeric uid by the DeepCAD convention (dataset.py:94-100)
python scripts/make_drill_tree.py "$ROOT" "$N" 10000 >> "$LOG" 2>&1

say dedup_cad
REPO=$PWD
( cd "$ROOT" && time python "$REPO/data_process/deduplicate_cad.py" \
    --data deepcad_parsed --bit 6 --option deepcad \
    --split_json train_val_test_split.json ) >> "$LOG" 2>&1

say vae_stubs
if [ ! -d "$STUBS/surfvae" ]; then
  python scripts/tp_prep_r4.py "$STUBS" >> "$LOG" 2>&1
else
  echo "reusing $STUBS" >> "$LOG"
fi

COMMON="--data $ROOT/deepcad_parsed --list $ROOT/deepcad_data_split_6bit.pkl
        --max_face 30 --max_edge 20 --bf16 --num_workers 0
        --test_nepoch 9999 --save_nepoch 9999 --dir_name $ROOT/proj
        --surfvae $STUBS/surfvae --edgevae $STUBS/edgevae"

# ~320+ steps each at reference batch sizes over the at-scale tree
say surfpos@512
bash scripts/run_with_retry.sh /tmp/drill_stage.log \
  python ldm.py --option surfpos --batch_size 512 --train_nepoch 18 \
  --env drill_surfpos $COMMON
cat /tmp/drill_stage.log >> "$LOG"

say edgez@128
bash scripts/run_with_retry.sh /tmp/drill_stage.log \
  python ldm.py --option edgez --batch_size 128 --cache_latents \
  --train_nepoch 5 --env drill_edgez $COMMON
cat /tmp/drill_stage.log >> "$LOG"

say "drill done"
