#!/bin/bash
# Round-4b chip schedule — adapted to the post-reboot state in which
# every gitignored artifact (trained weights, data pools) was wiped.
# All accuracy stages of round4_chain.sh are impossible without the
# step-64150 checkpoint; what remains measurable is the perf queue,
# which is weight-agnostic:
#
#   stage 1: profile_step.py 128     (stage decomposition of the 666 ms)
#   stage 2: mfu_levers.py 128       (base/pallas/accum/remat/fused-heads)
#   stage 3: pallas_input_ab.py      (first real-Mosaic compile + A/B)
#   stage 4: profile_blocks.py 128   (per-block fwd+bwd)
#
# bench.py runs FIRST and separately (its contention check must see a
# quiet box). A persistent JAX compilation cache is enabled so the
# driver's round-end bench re-run hits warm compiles if the backend
# supports serialization (harmless if not).
#
# Usage: bash scripts/round4b_chain.sh

set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/round4b_chain.log
STALL_S=900
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

note() { echo "CHAIN[$(date -u +%H:%M:%S)]: $*" >> "$LOG"; }

run_once() {
  local SLOG=$1; shift
  # setsid: the stage gets its own process group so a stall kill takes
  # down the python grandchild too, not just the subshell (ADVICE r4 —
  # a surviving hung python keeps the chip and poisons later timings).
  setsid bash -c "cd '$REPO' && exec python -u $*" >> "$SLOG" 2>&1 &
  local PID=$!
  echo "$PID" > /tmp/round4_stage.pid
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    local AGE=$(( $(date +%s) - $(stat -c %Y "$SLOG" 2>/dev/null || echo 0) ))
    if [ "$AGE" -gt "$STALL_S" ]; then
      note "stall ${AGE}s in $*, killing group $PID"
      kill -9 -- "-$PID" 2>/dev/null
      sleep 5
      return 1
    fi
  done
  wait "$PID" 2>/dev/null
  return $?
}

measure() {
  local NAME=$1 SLOG=$2; shift 2
  note "stage $NAME start -> $SLOG"
  if ! run_once "$SLOG" "$@"; then
    note "stage $NAME retry"
    run_once "$SLOG" "$@" || note "stage $NAME FAILED twice"
  fi
  note "stage $NAME done"
}

mkdir -p "$REPO/logs"
echo $$ > /tmp/round4_chain.pid
note "===== round-4b chain start ====="

measure profile_step "$REPO/logs/profile_step_r4.log" \
  scripts/profile_step.py 128 null,targets,forward,fwdloss,grads,adam,step
measure mfu_levers "$REPO/logs/mfu_levers_r4.log" \
  scripts/mfu_levers.py 128 6
measure pallas_input_ab "$REPO/logs/pallas_input_ab_r4.log" \
  scripts/pallas_input_ab.py 128 8
# int8 throughput A/B only (random init: accuracy rows junk, labeled so
# in-log; the int8-vs-bf16 conv timing is weight-value-agnostic).
measure quant_tput "$REPO/logs/quant_tput_r4.log" \
  scripts/quant_eval.py 16 16
measure profile_blocks "$REPO/logs/profile_blocks_r4.log" \
  scripts/profile_blocks.py 128

note "===== round-4b chain COMPLETE ====="
