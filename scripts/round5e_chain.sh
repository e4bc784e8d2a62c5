#!/bin/bash
# Round-5e final evaluation chain: runs after the resumed training
# segment's deadline (trainer saves + snapshots + exits on its own).
# Same shape as round5d_chain.sh, minus the vprune A/B (adopted at
# 0.85, commit 4049705) plus the driver-protocol bench so the last
# committed numbers come from the FINAL checkpoint.
#
# Usage: bash scripts/round5e_chain.sh [train_pid_file]
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
CHAINLOG="$REPO/logs/round5e_chain.log"
echo $$ > /tmp/round5e_chain.pid
TRAIN_PID_FILE=${1:-/tmp/train_r5.pid}
WATCHDOG_PID_FILE=/tmp/watchdog_r5e.pid

log() { echo "[chain $(date -u +%H:%M:%S)] $*" | tee -a "$CHAINLOG"; }

# Wait for the trainer to finish (it stops itself at its deadline and
# saves the final checkpoint). Backstop: 10 min past nothing-alive.
log "waiting for trainer to exit"
for i in $(seq 1 200); do
  TPID=$(cat "$TRAIN_PID_FILE" 2>/dev/null || true)
  WPID=$(cat "$WATCHDOG_PID_FILE" 2>/dev/null || true)
  ALIVE=0
  [ -n "$TPID" ] && kill -0 "$TPID" 2>/dev/null && ALIVE=1
  [ -n "$WPID" ] && kill -0 "$WPID" 2>/dev/null && ALIVE=1
  [ "$ALIVE" = 0 ] && break
  sleep 30
done
log "trainer gone; probing tunnel"
curl -s -m 5 -o /dev/null -w "tunnel %{http_code}\n" http://127.0.0.1:8083/ | tee -a "$CHAINLOG"
sleep 10

stage() {
  NAME=$1; TMO=$2; shift 2
  log "stage $NAME: $*"
  setsid timeout "$TMO" "$@" >> "logs/${NAME}_r5e.log" 2>&1 &
  SPID=$!
  echo "$SPID" > /tmp/round5e_stage.pid
  wait "$SPID"; RC=$?
  rm -f /tmp/round5e_stage.pid
  log "stage $NAME rc=$RC"
  git add "logs/${NAME}_r5e.log" logs/final_eval_step*.csv 2>/dev/null
  git commit -q -m "r5e chain: ${NAME} measured (final checkpoint)" 2>/dev/null
  sleep 5
}

stage final_eval   3600 python -u scripts/final_eval.py 256
stage bench        1800 python -u bench.py
stage degraded     2400 python -u scripts/degraded_bench.py 128
stage cross_engine 2400 python -u scripts/cross_engine_eval.py 128

log "chain complete"
