#!/bin/bash
# Round-5 post-training evaluation chain (VERDICT r4 next-round
# #2/#3/#7/#8/#10). Waits until <takeover_epoch_s> (or until the r5
# training watchdog exits on its own), stops the trainer cleanly,
# snapshots + commits the final weights, then runs the chip evaluation
# queue one stage at a time, committing each stage's log as it lands.
#
# Writes /tmp/round4_chain.pid + /tmp/round4_stage.pid so bench.py's
# chip-priority protocol can pause this chain if the driver bench fires
# mid-stage (bench.py:_CHIP_HOLDERS).
#
# Tunnel-down stages fall back to the CPU recipes from the verify skill
# (smaller n; still real accuracy evidence).
#
# Usage: bash scripts/round5_chain.sh <takeover_epoch_s>
set -u
TAKEOVER=${1:?takeover epoch seconds}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
echo $$ > /tmp/round4_chain.pid
CHAINLOG="$REPO/logs/round5_chain.log"

log() { echo "[chain $(date -u +%H:%M:%S)] $*" >> "$CHAINLOG"; }

tunnel_up() {
  [ "$(curl -s -m 5 -o /dev/null -w '%{http_code}' http://127.0.0.1:8083/ 2>/dev/null)" != "000" ]
}

log "chain started, takeover at $TAKEOVER (now $(date +%s))"

# --- 1. Wait for takeover time (or natural watchdog exit) -----------
while [ "$(date +%s)" -lt "$TAKEOVER" ]; do
  WPID=$(cat /tmp/watchdog_r5.pid 2>/dev/null || true)
  { [ -n "$WPID" ] && kill -0 "$WPID" 2>/dev/null; } || break
  sleep 30
done

# --- 2. Stop watchdog first (it cannot relaunch), then trainer group -
WPID=$(cat /tmp/watchdog_r5.pid 2>/dev/null || true)
if [ -n "$WPID" ] && kill -0 "$WPID" 2>/dev/null; then
  log "stopping watchdog $WPID + trainer process group"
  kill "$WPID" 2>/dev/null
  TPID=$(cat /tmp/train_r5.pid 2>/dev/null || true)
  if [ -n "$TPID" ]; then
    kill -TERM -- "-$TPID" 2>/dev/null
    sleep 20
    kill -KILL -- "-$TPID" 2>/dev/null
  fi
  sleep 10
else
  log "watchdog already exited"
fi

# --- 3. Final snapshot + commit from the latest orbax checkpoint ----
env JAX_PLATFORMS=cpu python - >> "$CHAINLOG" 2>&1 <<EOF
import sys, os
sys.path.insert(0, "$REPO"); os.chdir("$REPO")
from scripts.snapshot_weights import save
p = save("$REPO/weights", "r5")
os.replace(p, "$REPO/snapshots/r5_latest.npz")
print("final snapshot written from weights/")
EOF
git add snapshots/r5_latest.npz 2>/dev/null
git commit -q -m "r5 final training snapshot (post-deadline chain)" \
  -- snapshots/r5_latest.npz 2>/dev/null
log "final snapshot committed"

# --- 4. Evaluation queue --------------------------------------------
# stage <name> <timeout_s> <cmd...>: run bound + pid-filed + committed.
stage() {
  NAME=$1; TMO=$2; shift 2
  log "stage $NAME: $*"
  setsid timeout "$TMO" "$@" >> "logs/${NAME}_r5.log" 2>&1 &
  SPID=$!
  echo "$SPID" > /tmp/round4_stage.pid
  wait "$SPID"; RC=$?
  rm -f /tmp/round4_stage.pid
  log "stage $NAME rc=$RC"
  git add "logs/${NAME}_r5.log" 2>/dev/null
  git commit -q -m "r5 chain: ${NAME} measured" -- "logs/${NAME}_r5.log" \
    2>/dev/null
  sleep 5
}

CPUENV=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)

if tunnel_up; then
  stage final_eval   2700 python -u scripts/final_eval.py 256
else
  stage final_eval   2700 "${CPUENV[@]}" python -u scripts/final_eval.py 96
fi
if tunnel_up; then
  stage degraded     2400 python -u scripts/degraded_bench.py 128
else
  stage degraded     2400 "${CPUENV[@]}" python -u scripts/degraded_bench.py 48
fi
if tunnel_up; then
  stage cross_engine 2400 python -u scripts/cross_engine_eval.py 128
else
  stage cross_engine 2400 "${CPUENV[@]}" python -u scripts/cross_engine_eval.py 48
fi
if tunnel_up; then
  stage quant        2400 python -u scripts/quant_eval.py 256 64
  stage rbg_matrix   1800 python -u scripts/diag_train_metric.py 8 16
  stage bench        1800 python -u bench.py
  # refcond: BASE eval + deadline-bounded fine-tune (pool gen is CPU).
  stage refcond      3600 python -u scripts/refcond_experiment.py \
    "$(( $(date +%s) + 3300 ))"
else
  log "tunnel down: quant/rbg/bench/refcond skipped (chip-only)"
fi

log "chain complete"
