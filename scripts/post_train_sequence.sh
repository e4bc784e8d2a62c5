#!/bin/bash
# Post-training measurement sequence (round 2): waits for the training
# watchdog to finish, then runs every chip-bound evaluation in order.
# Usage: bash scripts/post_train_sequence.sh [train_log]

set -u
TRAIN_LOG=${1:-/tmp/train_phase3b.log}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

while ! tail -3 "$TRAIN_LOG" 2>/dev/null | grep -q "WATCHDOG: done"; do
  sleep 60
done
sleep 10
echo "== post-train sequence start $(date) =="

cp "$TRAIN_LOG" logs/train_phase3.log

echo "== final_eval =="
python -u scripts/final_eval.py 256 > /tmp/final_eval_r2.log 2>&1
cp /tmp/final_eval_r2.log logs/final_eval_r2.log

echo "== degraded_bench =="
python -u scripts/degraded_bench.py 128 > /tmp/degraded_r2.log 2>&1
cp /tmp/degraded_r2.log logs/degraded_bench_r2.log

echo "== bench =="
python -u bench.py > /tmp/bench_r2_final.log 2>&1

echo "== slow multihost test =="
python -m pytest tests/test_multihost.py -q -m "slow or not slow" \
  > /tmp/multihost_r2.log 2>&1

echo "== done $(date) =="
