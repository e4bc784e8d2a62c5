#!/bin/bash
# Round-5 stall watchdog for scripts/train_r5.py: kill-and-relaunch on
# log stalls (tunnel drops were the round-2..4 failure mode), absolute
# deadline so relaunches cannot reset the LR schedule.
#
# ABC_TRAIN_VARIANT (exported to the trainer) selects the train-step
# implementation; the watchdog passes the environment through, so a
# mid-run swap = edit /tmp/train_r5.env + kill the python PID.
#
# Usage: bash scripts/train_watchdog_r5.sh <deadline_epoch_s> <total_hours> <log>

set -u
DEADLINE=${1:?deadline epoch seconds}
TOTAL_H=${2:?total hours (the ORIGINAL full-run budget)}
LOG=${3:-/root/repo/logs/train_r5.log}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
STALL_S=900

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  echo "WATCHDOG: launching train_r5 (deadline $DEADLINE)" >> "$LOG"
  # Optional per-relaunch env overrides (e.g. ABC_TRAIN_VARIANT=scan2).
  [ -f /tmp/train_r5.env ] && . /tmp/train_r5.env
  # setsid: the launched tree gets its own process group so a stall
  # kill takes down the python grandchild too, not just the subshell
  # (ADVICE r4 on round4b_chain.sh).
  setsid bash -c "cd '$REPO' && exec python -u scripts/train_r5.py \
      '$DEADLINE' '$TOTAL_H'" >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > /tmp/train_r5.pid
  while kill -0 "$PID" 2>/dev/null; do
    sleep 120
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALL_S" ]; then
      echo "WATCHDOG: no log progress for ${AGE}s, killing group $PID" >> "$LOG"
      kill -9 -- "-$PID" 2>/dev/null
      sleep 10
      break
    fi
  done
  wait "$PID" 2>/dev/null
  if tail -5 "$LOG" | grep -q "^RUN COMPLETE"; then
    echo "WATCHDOG: run completed" >> "$LOG"
    break
  fi
done
echo "WATCHDOG: done" >> "$LOG"
