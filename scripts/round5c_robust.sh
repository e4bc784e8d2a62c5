#!/bin/bash
# Round-5c OPTIONAL post-chain stage: robustness fine-tune from the
# FINAL r5 checkpoint, then re-measure the degraded + clean evals.
#
# Runs only if wall time remains after scripts/round5b_chain.sh; the
# decision to launch (and the promotion decision afterwards) is
# manual. Targets the one unmet round-5 metric: blur_r2/erode exact
# >= 0.5 (r5 @27500: 0.2344/0.1641, from 0.0208 in r4).
#
# Reuses the r5 mixed pool (already 15% engine-B + degrade_p=0.10
# baked in, scripts/build_pool_r5.py) and raises the degradation rate
# via FT_DEGRADE_P; the separate engine-B pool is a 64-sample stub
# because the main pool already carries the B-engine signal.
# Production weights/ are untouched: the FT writes weights_robust/,
# and promotion requires a degraded win with clean exact within 1 pt
# (logs/final_eval_r5c.log vs logs/final_eval_r5b.log).
#
# Usage: bash scripts/round5c_robust.sh <ft_deadline_epoch_s>
set -u
FT_DEADLINE=${1:?fine-tune deadline epoch seconds}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
echo $$ > /tmp/round5c.pid
CHAINLOG="$REPO/logs/round5c_robust.log"
log() { echo "[r5c $(date -u +%H:%M:%S)] $*" >> "$CHAINLOG"; }

stage() {
  NAME=$1; TMO=$2; shift 2
  log "stage $NAME: $*"
  setsid timeout "$TMO" "$@" >> "logs/${NAME}_r5c.log" 2>&1 &
  SPID=$!
  echo "$SPID" > /tmp/round5c_stage.pid
  wait "$SPID"; RC=$?
  rm -f /tmp/round5c_stage.pid
  log "stage $NAME rc=$RC"
  git add "logs/${NAME}_r5c.log" 2>/dev/null
  git commit -q -m "r5c: ${NAME} measured" 2>/dev/null
  sleep 5
}

log "r5c started, FT deadline $FT_DEADLINE (now $(date +%s))"

# 1. Fine-tune from the final production checkpoint.
FT_TMO=$(( FT_DEADLINE - $(date +%s) + 300 ))
stage ft_robust "$FT_TMO" env FT_DEGRADE_P=0.35 FT_B_FRAC=0.008 \
  python -u scripts/finetune_robust.py "$FT_DEADLINE" \
  data_cache/pool_r5.npz data_cache/pool_b_ft.npz weights_robust

# 2. Snapshot the fine-tuned weights as a git artifact.
env JAX_PLATFORMS=cpu python - >> "$CHAINLOG" 2>&1 <<EOF
import sys, os
sys.path.insert(0, "$REPO"); os.chdir("$REPO")
from scripts.snapshot_weights import save
p = save("$REPO/weights_robust", "r5robust")
os.replace(p, "$REPO/snapshots/r5_robust.npz")
print("robust snapshot written from weights_robust/")
EOF
git add snapshots/r5_robust.npz 2>/dev/null
git commit -q -m "r5c robust fine-tune snapshot" -- snapshots/r5_robust.npz 2>/dev/null
log "robust snapshot committed"

# 3. Measure: degraded (the target metric) + clean regression check.
stage degraded   2400 python -u scripts/degraded_bench.py 128 weights_robust
stage final_eval 2400 python -u scripts/final_eval.py 128 weights_robust

log "r5c complete (promotion decision is manual)"
