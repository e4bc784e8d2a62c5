#!/bin/bash
# Round-5f: hard-tail robustness fine-tune + gated re-measure.
#
# Runs after the round-5e chain releases the chip. Fine-tunes the final
# production checkpoint under the hard-tail degradation regime
# (data/degrade.py random_degrade(hard=True): blur/erode-biased draw,
# partial ragged erosion — the r5 main run's degrade_p=0.10 default
# regime leaves blur_r2/erode collapsed at 0.20/0.18,
# logs/degraded_r5d.log), then re-measures:
#
#   degraded_bench 128 weights_robust   — did the collapse cases move?
#   final_eval 128 weights_robust       — did clean accuracy hold?
#
# Promotion of weights_robust to the serving default is a manual gate
# on those two logs (rule: blur_r2+erode up, clean exact within 1 pt).
#
# Usage: bash scripts/round5f_chain.sh <hard_end_epoch_s>
#   fine-tune deadline = hard_end - EVAL_RESERVE_S (evals + margin).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
CHAINLOG="$REPO/logs/round5f_chain.log"
echo $$ > /tmp/round5f_chain.pid
HARD_END=${1:?hard_end_epoch_s required}
EVAL_RESERVE_S=${EVAL_RESERVE_S:-2100}

log() { echo "[chain $(date -u +%H:%M:%S)] $*" | tee -a "$CHAINLOG"; }

# Wait for every earlier chip holder (r5e chain + its stage, trainer,
# watchdog) to exit. Backstop: proceed once nothing is alive.
log "waiting for the r5e chain / trainer to release the chip"
for i in $(seq 1 400); do
  ALIVE=0
  for f in /tmp/round5e_chain.pid /tmp/round5e_stage.pid \
           /tmp/train_r5.pid /tmp/watchdog_r5e.pid; do
    P=$(cat "$f" 2>/dev/null || true)
    [ -n "$P" ] && kill -0 "$P" 2>/dev/null && ALIVE=1
  done
  [ "$ALIVE" = 0 ] && break
  sleep 20
done
log "chip free; probing tunnel"
curl -s -m 5 -o /dev/null -w "tunnel %{http_code}\n" http://127.0.0.1:8083/ | tee -a "$CHAINLOG"
sleep 10

NOW=$(date +%s)
FT_DEADLINE=$((HARD_END - EVAL_RESERVE_S))
if [ "$FT_DEADLINE" -le $((NOW + 300)) ]; then
  log "under 5 min of fine-tune budget left ($((FT_DEADLINE - NOW))s); skipping fine-tune"
else
  log "fine-tune until $FT_DEADLINE ($(((FT_DEADLINE - NOW) / 60)) min)"
  FTLOG="$REPO/logs/finetune_robust_r5f.log"
  touch "$FTLOG"
  STALL_S=600
  # Kill-and-relaunch on log stall (the tunnel-hang failure mode from
  # rounds 2-5; finetune_robust resumes from weights_robust on its own,
  # and its 1000-step checkpoints bound the loss).
  while [ "$(date +%s)" -lt "$FT_DEADLINE" ]; do
    log "launching finetune_robust (deadline $FT_DEADLINE)"
    stage_tmo=$((FT_DEADLINE - $(date +%s) + 120))
    setsid timeout "$stage_tmo" python -u scripts/finetune_robust.py \
      "$FT_DEADLINE" data_cache/pool_r5.npz \
      >> "$FTLOG" 2>&1 &
    SPID=$!
    echo "$SPID" > /tmp/round5f_stage.pid
    while kill -0 "$SPID" 2>/dev/null; do
      sleep 60
      AGE=$(( $(date +%s) - $(stat -c %Y "$FTLOG") ))
      if [ "$AGE" -gt "$STALL_S" ]; then
        log "fine-tune stalled ${AGE}s; killing group $SPID"
        kill -9 -- "-$SPID" 2>/dev/null
        sleep 10
        break
      fi
    done
    wait "$SPID" 2>/dev/null; RC=$?
    if tail -5 "$FTLOG" | grep -q "fine-tuned .* steps"; then
      break
    fi
  done
  rm -f /tmp/round5f_stage.pid
  log "fine-tune done (rc=$RC)"
  git add logs/finetune_robust_r5f.log 2>/dev/null
  git commit -q -m "r5f: hard-tail robustness fine-tune log" 2>/dev/null
fi

stage() {
  NAME=$1; TMO=$2; shift 2
  log "stage $NAME: $*"
  setsid timeout "$TMO" "$@" >> "logs/${NAME}_r5f.log" 2>&1 &
  SPID=$!
  echo "$SPID" > /tmp/round5f_stage.pid
  wait "$SPID"; RC=$?
  rm -f /tmp/round5f_stage.pid
  log "stage $NAME rc=$RC"
  git add "logs/${NAME}_r5f.log" 2>/dev/null
  git commit -q -m "r5f chain: ${NAME} measured (weights_robust)" 2>/dev/null
  sleep 5
}

if [ -d weights_robust ] && [ -n "$(ls weights_robust 2>/dev/null)" ]; then
  stage degraded   1500 python -u scripts/degraded_bench.py 128 weights_robust
  stage final_eval 1200 python -u scripts/final_eval.py 128 weights_robust
  log "snapshotting weights_robust"
  python -u scripts/snapshot_weights.py save weights_robust r5_robust \
    >> "$CHAINLOG" 2>&1
  git add snapshots/r5_robust_step*.npz 2>/dev/null
  git commit -q -m "r5f: weights_robust f16 snapshot (git artifact)" 2>/dev/null
else
  log "no weights_robust checkpoint produced; skipping evals"
fi

log "chain complete"
