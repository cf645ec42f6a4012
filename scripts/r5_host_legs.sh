#!/bin/bash
# Host-only round-5 legs pulled forward off the serial TPU queue (they are
# hard-no-jax: replay_postprocess traps jax imports; step_conformance is
# pure stdlib+math). Sequential to leave the single host core mostly free
# for the concurrently-running trainer's input pipeline.
cd "$(dirname "$0")/.."
R5=artifacts/demo_round5
OUT=$R5/r256_replays.log
: > "$OUT"
for abl in "" "--strict" "--ablate 6" "--ablate 5" "--ablate 4"; do
  echo "=== replay $abl ($(date -u +%H:%M:%S)) ===" >> "$OUT"
  nice -n 10 python scripts/replay_postprocess.py $R5/resample256/batches.npz $abl >> "$OUT" 2>&1
  echo "=== rc=$? ===" >> "$OUT"
done
echo "=== conformance ($(date -u +%H:%M:%S)) ===" >> "$OUT"
find $R5/resample256 $R5/resample256_strict -name "*.step" | sort > /tmp/r5_n256_steps.txt
wc -l /tmp/r5_n256_steps.txt >> "$OUT"
nice -n 10 xargs -a /tmp/r5_n256_steps.txt python -m brepgen_tpu.geometry.step_conformance \
  > $R5/conformance_audit_n256.txt 2>&1
echo "conformance rc=$? conformant=$(grep -c ': CONFORMANT' $R5/conformance_audit_n256.txt) of $(wc -l < /tmp/r5_n256_steps.txt)" >> "$OUT"
echo "=== host legs done ($(date -u +%H:%M:%S)) ===" >> "$OUT"
