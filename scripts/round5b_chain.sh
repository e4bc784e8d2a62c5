#!/bin/bash
# Round-5b post-training evaluation chain: same takeover protocol as
# scripts/round5_chain.sh but for the RESUMED r5 training segment
# (step 27500 -> deadline). Differences:
#   - adds the vprune adoption A/B (scripts/vprune_ab.py) at n=256,
#     the gate REPORT_r5.md 2 left pending;
#   - drops quant (retired with numbers, logs/quant_r5.log) and
#     rbg_matrix (closed, logs/rbg_matrix_r5.log);
#   - logs land in logs/<stage>_r5b.log so the r5 chain evidence is
#     not clobbered.
#
# Usage: bash scripts/round5b_chain.sh <takeover_epoch_s>
set -u
TAKEOVER=${1:?takeover epoch seconds}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
echo $$ > /tmp/round4_chain.pid
CHAINLOG="$REPO/logs/round5b_chain.log"

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
git commit -q -m "r5b final training snapshot (resumed segment, post-deadline chain)" \
  -- snapshots/r5_latest.npz 2>/dev/null
log "final snapshot committed"

# --- 4. Evaluation queue --------------------------------------------
stage() {
  NAME=$1; TMO=$2; shift 2
  log "stage $NAME: $*"
  setsid timeout "$TMO" "$@" >> "logs/${NAME}_r5b.log" 2>&1 &
  SPID=$!
  echo "$SPID" > /tmp/round4_stage.pid
  wait "$SPID"; RC=$?
  rm -f /tmp/round4_stage.pid
  log "stage $NAME rc=$RC"
  git add "logs/${NAME}_r5b.log" logs/final_eval_step*.csv 2>/dev/null
  git commit -q -m "r5b chain: ${NAME} measured" 2>/dev/null
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
  stage vprune       2400 python -u scripts/vprune_ab.py 256
else
  stage vprune       2400 "${CPUENV[@]}" python -u scripts/vprune_ab.py 96
fi
if tunnel_up; then
  stage bench        1800 python -u bench.py
  # refcond: BASE eval + deadline-bounded fine-tune (pool gen is CPU).
  # Clear the r5 fine-tune checkpoints first so the FT restarts from
  # the NEW production checkpoint instead of resuming the old one.
  rm -rf "$REPO/weights_refcond"
  stage refcond      3600 python -u scripts/refcond_experiment.py \
    "$(( $(date +%s) + 3300 ))"
else
  log "tunnel down: bench/refcond skipped (chip-only)"
fi

log "chain complete"
