#!/bin/bash
# Same stall watchdog as train_watchdog_r2.sh but takes an EXPLICIT
# absolute deadline — used to resume training after a planned pause
# (e.g. a profiling window) without resetting the LR schedule.
#
# Usage: bash scripts/train_watchdog_r2b.sh <deadline_epoch_s> <total_hours> <log>

set -u
DEADLINE=${1:?deadline epoch seconds}
TOTAL_H=${2:?total hours (the ORIGINAL full-run budget)}
LOG=${3:-/tmp/train_r2.log}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
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
