#!/bin/bash
# Stall watchdog for the robustness fine-tune (see train_watchdog.sh
# for why: the axon tunnel can hang mid-run; checkpoints every 1000
# steps bound the loss; the script resumes from weights_robust/).
#
# Usage: bash scripts/robust_watchdog.sh <total_hours> <log>

set -u
TOTAL_H=${1:-3.0}
LOG=${2:-/tmp/finetune_robust.log}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DEADLINE=$(( $(date +%s) + $(python3 -c "print(int($TOTAL_H*3600))") ))
STALL_S=600

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  # Fail fast when the relay is dead (it cannot be restarted from
  # inside the VM; JAX would burn ~30 min in silent retries).
  CODE=$(curl -s -m 5 -o /dev/null -w "%{http_code}" http://127.0.0.1:8083/ || true)
  if [ "$CODE" = "000" ]; then
    echo "WATCHDOG: relay down, waiting 120s" >> "$LOG"
    sleep 120
    continue
  fi
  echo "WATCHDOG: launching finetune_robust until $DEADLINE" >> "$LOG"
  ( cd "$REPO" && python -u scripts/finetune_robust.py "$DEADLINE" ) \
      >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 120
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALL_S" ]; then
      echo "WATCHDOG: no log progress for ${AGE}s, killing $PID" >> "$LOG"
      kill -9 "$PID" 2>/dev/null
      sleep 10
      break
    fi
  done
  wait "$PID" 2>/dev/null
  if tail -8 "$LOG" | grep -q "^next:"; then
    echo "WATCHDOG: run completed" >> "$LOG"
    break
  fi
done
echo "WATCHDOG: done" >> "$LOG"
