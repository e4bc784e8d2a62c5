#!/bin/bash
# Round-3 end-of-round sequence: waits for the chip chain to finish,
# then runs the measurement queue back-to-back so the chip never idles
# (each step bounded; the axon tunnel can hang a process mid-run).
#
# Usage: nohup bash scripts/post_chain_r3.sh > /tmp/post_chain_r3.log 2>&1 &
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

CHAIN_PID=$(cat /tmp/chain.pid 2>/dev/null || echo "")
if [ -n "$CHAIN_PID" ]; then
  while kill -0 "$CHAIN_PID" 2>/dev/null; do
    sleep 60
  done
fi
echo "POST: chain done at $(date -u)"

run() {  # run <timeout_s> <log> <cmd...>
  local T=$1 LOG=$2; shift 2
  echo "POST: $* -> $LOG ($(date -u))"
  timeout "$T" "$@" > "$LOG" 2>&1
  echo "POST: exit $? ($(date -u))"
}

# 1. Pallas A/B (batched kernel vs XLA top_k)
run 900 /tmp/profile_ab_r3.log python -u scripts/profile_step.py 64 null,infer,infer_pallas

# 2. Headline bench (batch 64 + train-batch 128 + rbg defaults)
run 900 /tmp/bench_r3.log python -u bench.py

# 3. Fresh-512 final eval, round-2 protocol, production weights/
run 2400 /tmp/final_eval_r3.log python -u scripts/final_eval.py 256

# 4. Per-block backward profile (MFU target localization)
run 1800 /tmp/profile_blocks_r3.log python -u scripts/profile_blocks.py 128

# 5. Degraded-input robustness sweep (UOB stand-in), same as round 2
run 1500 /tmp/degraded_r3.log python -u scripts/degraded_bench.py 128

# Retain logs in the repo
for f in profile_ab_r3 bench_r3 final_eval_r3 profile_blocks_r3 degraded_r3; do
  cp -f /tmp/$f.log logs/$f.log 2>/dev/null
done
cp -f /tmp/ft_hard.log logs/ft_hard_r3.log 2>/dev/null
cp -f /tmp/refcond.log logs/refcond_r3.log 2>/dev/null
cp -f /tmp/cbam.log logs/cbam_r3.log 2>/dev/null
echo "POST: all done at $(date -u)"
