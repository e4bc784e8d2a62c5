#!/bin/bash
# Stall watchdog for long TPU training runs over the axon tunnel.
#
# The tunnel occasionally hangs mid-run (observed r2: training froze at
# 0% CPU blocking on a device fetch; the process never recovers but a
# fresh process reconnects fine). Training checkpoints every 2500 steps
# with full optimizer state, so kill-and-relaunch loses at most ~30 min.
#
# Usage: bash scripts/train_watchdog.sh <total_hours> <lr> <log>

set -u
TOTAL_H=${1:-3.4}
LR=${2:-5e-5}
LOG=${3:-/tmp/train_phase3b.log}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DEADLINE=$(( $(date +%s) + $(python3 -c "print(int($TOTAL_H*3600))") ))
STALL_S=600

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  REM_H=$(python3 -c "print(max(($DEADLINE - $(date +%s)) / 3600.0, 0.02))")
  echo "WATCHDOG: launching train_phase3 for ${REM_H}h" >> "$LOG"
  ( cd "$REPO" && python -u scripts/train_phase3.py "$REM_H" "$LR" ) \
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
  if tail -5 "$LOG" | grep -q "^FINAL"; then
    echo "WATCHDOG: run completed" >> "$LOG"
    break
  fi
done
echo "WATCHDOG: done" >> "$LOG"
