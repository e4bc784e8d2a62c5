#!/bin/bash
# Post-training measurement sequence (round 2): waits for the training
# watchdog to finish, then runs every chip-bound evaluation in order
# (one python job at a time — 1 CPU core, 1 chip). Every step is
# timeout-bounded so a tunnel hang cannot kill the chain.
# Usage: bash scripts/post_train_sequence.sh [train_log]

set -u
TRAIN_LOG=${1:-/tmp/train_r2.log}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

while ! tail -3 "$TRAIN_LOG" 2>/dev/null | grep -q "WATCHDOG: done"; do
  sleep 60
done
sleep 10
echo "== post-train sequence start $(date) =="

cp "$TRAIN_LOG" logs/train_r2_full.log

echo "== final_eval =="
timeout 4200 python -u scripts/final_eval.py 256 > /tmp/final_eval_r2.log 2>&1
cp /tmp/final_eval_r2.log logs/final_eval_r2.log

echo "== classify final_eval failures =="
timeout 1200 env JAX_PLATFORMS=cpu python scripts/classify_results.py \
  $(ls -t logs/final_eval_step*.csv | head -1) 40 \
  > /tmp/classify_r2.log 2>&1
tail -5 /tmp/classify_r2.log
cp /tmp/classify_r2.log logs/classify_r2.log

echo "== img2smiles CLI drive (double-buffered serving loop) =="
timeout 600 env JAX_PLATFORMS=cpu python -m abcnet_tpu gen \
  --out /tmp/ds_drive -n 36 --seed 4242 > /tmp/cli_drive.log 2>&1
timeout 1500 python -u -m abcnet_tpu img2smiles --data /tmp/ds_drive \
  --out /tmp/r_drive.csv -b 16 --ckpt weights >> /tmp/cli_drive.log 2>&1
tail -2 /tmp/cli_drive.log
cp /tmp/cli_drive.log logs/cli_drive_r2.log

echo "== test-acc per-class P/R tables =="
timeout 1500 python -u -m abcnet_tpu test-acc --data /tmp/ds_drive \
  --ckpt weights -b 12 > /tmp/test_acc_r2.log 2>&1
tail -4 /tmp/test_acc_r2.log
cp /tmp/test_acc_r2.log logs/test_acc_r2.log

echo "== degraded_bench =="
timeout 4200 python -u scripts/degraded_bench.py 128 > /tmp/degraded_r2.log 2>&1
cp /tmp/degraded_r2.log logs/degraded_bench_r2.log

echo "== bench =="
timeout 2400 python -u bench.py > /tmp/bench_r2_final.log 2>&1
cp /tmp/bench_r2_final.log logs/bench_r2.log

echo "== decode A/B: XLA vs Pallas NMS =="
timeout 1500 python -u scripts/profile_step.py 64 null,infer,infer_pallas \
  > /tmp/profile_ab.log 2>&1
tail -3 /tmp/profile_ab.log
cp /tmp/profile_ab.log logs/profile_ab_r2.log

echo "== slow multihost test =="
timeout 1800 python -m pytest tests/test_multihost.py -q -m "slow or not slow" \
  > /tmp/multihost_r2.log 2>&1
tail -2 /tmp/multihost_r2.log

echo "== done $(date) =="
