#!/bin/bash
# Stall watchdog for the round-2 from-scratch run (train_r2_full.py).
#
# The axon tunnel occasionally hangs mid-run (observed r2: training
# froze at 0% CPU blocking on a device fetch; the process never
# recovers but a fresh process reconnects fine). Training checkpoints
# every 2500 steps with full optimizer state and the data pool is
# disk-cached, so kill-and-relaunch loses at most ~30 min.
#
# The ABSOLUTE deadline is computed once here and passed to every
# relaunch, so the LR schedule is restart-proof.
#
# Usage: bash scripts/train_watchdog_r2.sh <total_hours> <log>

set -u
TOTAL_H=${1:-7.0}
LOG=${2:-/tmp/train_r2.log}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DEADLINE=$(( $(date +%s) + $(python3 -c "print(int($TOTAL_H*3600))") ))
STALL_S=600

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  echo "WATCHDOG: launching train_r2_full (deadline $DEADLINE)" >> "$LOG"
  ( cd "$REPO" && python -u scripts/train_r2_full.py "$DEADLINE" "$TOTAL_H" ) \
      >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > /tmp/train_r2.pid
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
  if tail -5 "$LOG" | grep -q "^FINAL"; then
    echo "WATCHDOG: run completed" >> "$LOG"
    break
  fi
done
echo "WATCHDOG: done" >> "$LOG"
