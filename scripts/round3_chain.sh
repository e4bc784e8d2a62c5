#!/bin/bash
# Round-3 chip schedule: three deadline-bounded training stages run
# back-to-back so the single TPU chip never idles, each under the
# stall watchdog pattern from train_watchdog_r2.sh (the axon tunnel
# can hang a process mid-run; checkpoints + disk-cached pools make
# kill-and-relaunch cheap).
#
#   stage 1: scripts/finetune_hard.py       (production low-LR + mining)
#   stage 2: scripts/refcond_experiment.py  (reference-conditions expt)
#   stage 3: scripts/cbam_budget.py         (CBAM budget run)
#
# Usage: bash scripts/round3_chain.sh <h1> <h2> <h3>
#   e.g. bash scripts/round3_chain.sh 2.5 1.5 1.2

set -u
H1=${1:-2.5}; H2=${2:-1.5}; H3=${3:-1.2}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
STALL_S=600

run_stage() {  # run_stage <script> <hours> <log>
  local SCRIPT=$1 HOURS=$2 LOG=$3
  local DEADLINE=$(( $(date +%s) + $(python3 -c "print(int($HOURS*3600))") ))
  echo "CHAIN: stage $SCRIPT for ${HOURS}h (deadline $DEADLINE)" >> "$LOG"
  while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    ( cd "$REPO" && python -u "$SCRIPT" "$DEADLINE" ) >> "$LOG" 2>&1 &
    local PID=$!
    echo "$PID" > /tmp/round3_stage.pid
    while kill -0 "$PID" 2>/dev/null; do
      sleep 120
      local AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
      if [ "$AGE" -gt "$STALL_S" ]; then
        echo "CHAIN: stall ${AGE}s, killing $PID" >> "$LOG"
        kill -9 "$PID" 2>/dev/null
        sleep 10
        break
      fi
    done
    wait "$PID" 2>/dev/null
    if tail -5 "$LOG" | grep -q "FINAL"; then
      echo "CHAIN: stage completed" >> "$LOG"
      break
    fi
  done
  echo "CHAIN: stage $SCRIPT done" >> "$LOG"
}

run_stage scripts/finetune_hard.py      "$H1" /tmp/ft_hard.log
run_stage scripts/refcond_experiment.py "$H2" /tmp/refcond.log
run_stage scripts/cbam_budget.py        "$H3" /tmp/cbam.log
echo "CHAIN: all stages done"
