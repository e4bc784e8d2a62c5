#!/bin/bash
# Round-5d evaluation chain: the 5b stages that never landed (the VM
# was rebuilt mid-chain), re-run from the committed step-37500 git
# snapshot restored into weights/.  Runs each stage sequentially on
# the chip, logs to logs/<stage>_r5d.log, commits each log as it
# lands.  No takeover logic needed: nothing else holds the chip.
#
# Usage: bash scripts/round5d_chain.sh
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
CHAINLOG="$REPO/logs/round5d_chain.log"
echo $$ > /tmp/round5d_chain.pid

log() { echo "[chain $(date -u +%H:%M:%S)] $*" | tee -a "$CHAINLOG"; }

stage() {
  NAME=$1; TMO=$2; shift 2
  log "stage $NAME: $*"
  setsid timeout "$TMO" "$@" >> "logs/${NAME}_r5d.log" 2>&1 &
  SPID=$!
  echo "$SPID" > /tmp/round5d_stage.pid
  wait "$SPID"; RC=$?
  rm -f /tmp/round5d_stage.pid
  log "stage $NAME rc=$RC"
  git add "logs/${NAME}_r5d.log" logs/final_eval_step*.csv 2>/dev/null
  git commit -q -m "r5d chain: ${NAME} measured (step-37500 snapshot)" 2>/dev/null
  sleep 5
}

stage final_eval   3600 python -u scripts/final_eval.py 256
stage degraded     3000 python -u scripts/degraded_bench.py 128
stage cross_engine 3000 python -u scripts/cross_engine_eval.py 128
stage vprune       3000 python -u scripts/vprune_ab.py 256

log "chain complete"
