#!/bin/bash
# Round-5 queue, part 4 (continues r5_queue3.sh after its takeover).
# Adds one insurance leg: bench.py was restructured this round
# (compacted-detail refactor at 7f45991) and has never executed — run it
# once mid-round so a breakage is caught with hours to fix, not at the
# driver's end-of-round run. Otherwise the remaining queue3 tail,
# unchanged, in VERDICT priority order.
cd "$(dirname "$0")/.."
R5=artifacts/demo_round5
Q=$R5/queue.log

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
  echo "--- metrics_w0.6_cuboid_vs_cylinder rc=? end $(date -u +%H:%M:%S) (adopted by queue4) ---" >> "$Q"
fi
echo "=== r5 queue4 start $(date -u +%H:%M:%S) ===" >> "$Q"

leg() {
  local name="$1"; shift
  echo "--- $name start $(date -u +%H:%M:%S) ---" >> "$Q"
  "$@" >> "$Q" 2>&1
  echo "--- $name rc=$? end $(date -u +%H:%M:%S) ---" >> "$Q"
}

# ---- remaining cross-class MMD matrix legs (item 1) ----
for pair in "prism cuboid" "prism cylinder" "cylinder cuboid" "cylinder prism"; do
  set -- $pair
  leg "metrics_w0.6_$1_vs_$2" python scripts/demo_metrics.py \
    --run $R5/cf_guidance --cls "$1" --vs "$2" \
    --samples_dir $R5/cf_guidance/w0.6/$1
done

# ---- bench.py insurance run (restructured at 7f45991, never executed) ----
leg bench_r5 bash scripts/run_with_retry.sh /tmp/bench_r5.log \
  python bench.py
cat /tmp/bench_r5.log >> "$Q" 2>/dev/null

# ---- uncond mixed-family 160k retrain (items 3+4) ----
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
# n=256 chamfer matrices run ON THE CHIP (idle between queue legs):
# 256x256x3 repeats is hours on the one host core, minutes on-device
leg metrics_n256_recovered python scripts/demo_metrics.py \
  --run $R5/resample256 --family all --heldout 256 --device tpu
leg metrics_n256_strict python scripts/demo_metrics.py \
  --run $R5/resample256_strict --family all --heldout 256 --device tpu

# ---- held-out family: ladder generalization (item 5) ----
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

# ---- throughput follow-ups ----
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
leg edgez_dots bash scripts/run_with_retry.sh /tmp/tp_r5/stage3.log \
  python ldm.py --option edgez --batch_size 128 --cache_latents \
  --remat dots --train_nepoch 40 --env tp_edgez_dots \
  --synthetic 1024 --max_face 30 --max_edge 20 --bf16 --num_workers 0 \
  --test_nepoch 9999 --save_nepoch 9999 --dir_name /tmp/tp_r5/proj \
  --surfvae "$STUBS/surfvae" --edgevae "$STUBS/edgevae"
cat /tmp/tp_r5/stage3.log >> "$Q" 2>/dev/null

# ---- 161k-scale input-pipeline drill (item 8, 6k tree) ----
leg drill bash scripts/drill_161k_r5.sh

echo "=== r5 queue4 done $(date -u +%H:%M:%S) ===" >> "$Q"
