#!/bin/bash
# Run a (jax/TPU) command, retrying on backend-acquisition failure.
# The tunneled axon backend intermittently reports UNAVAILABLE at session
# acquisition; that is transient, so retry with a pause rather than dying.
# Usage: run_with_retry.sh <logfile> <cmd...>
LOG="$1"; shift
for attempt in 1 2 3 4 5 6 7 8; do
  echo "=== attempt $attempt: $(date -u +%H:%M:%S) ===" >> "$LOG.attempts"
  "$@" > "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== success on attempt $attempt ===" >> "$LOG.attempts"
    exit 0
  fi
  if grep -q "Unable to initialize backend\|UNAVAILABLE" "$LOG"; then
    echo "backend unavailable (rc=$rc); sleeping 180s" >> "$LOG.attempts"
    sleep 180
    continue
  fi
  echo "non-backend failure rc=$rc; giving up" >> "$LOG.attempts"
  exit $rc
done
echo "=== exhausted retries ===" >> "$LOG.attempts"
exit 1
