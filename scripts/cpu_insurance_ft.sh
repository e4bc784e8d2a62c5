#!/bin/bash
# CPU insurance for the robustness fine-tune (VERDICT r3 next #3).
#
# While the axon tunnel is down the 1-core host is otherwise idle, so
# run finetune_robust.py at FT_BATCH=16 into /tmp/weights_robust_cpu —
# enough images to prove the degradation augmentation lifts blur/erode
# at all, even if the full-scale chip fine-tune never gets to run this
# round. Runs in ~45-min segments (each segment ends with a durable
# checkpoint + eval) and exits the moment the tunnel returns so the
# chip chain owns the box. Finishes with a small-n degraded_bench.
#
# On CPU each (re)launch pays ~12 min of pool loads + ~10 min of
# compiles, and finetune_robust.py already checkpoints+resumes every
# 1000 steps — so the default is ONE long segment; crash durability
# comes from the in-script checkpoints, and the 60 s tunnel poll still
# yields the core promptly.
#
# Usage: bash scripts/cpu_insurance_ft.sh [hours=5] [wait_pidfile] [seg_s]

set -u
HOURS=${1:-5}
WAITPID=${2:-}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="$REPO/logs/ft_robust_cpu_insurance.log"
OUT=/tmp/weights_robust_cpu
SEG_S=${3:-999999}
END=$(( $(date +%s) + $(python3 -c "print(int($HOURS*3600))") ))

tunnel_up() {
  [ "$(curl -s -m 5 -o /dev/null -w '%{http_code}' http://127.0.0.1:8083/)" = "200" ]
}

note() { echo "INSURANCE[$(date -u +%H:%M:%S)]: $*" >> "$LOG"; }
echo $$ > /tmp/cpu_ft.pid
note "start (${HOURS}h, segments ${SEG_S}s)"

# Optionally wait for a prior CPU job (e.g. quant_eval) to release the core.
if [ -n "$WAITPID" ] && [ -f "$WAITPID" ]; then
  while kill -0 "$(cat "$WAITPID")" 2>/dev/null; do sleep 30; done
fi

while [ "$(date +%s)" -lt "$END" ]; do
  if tunnel_up; then note "tunnel up — yielding the core"; exit 0; fi
  SEG_END=$(( $(date +%s) + SEG_S ))
  [ "$SEG_END" -gt "$END" ] && SEG_END=$END
  ( cd "$REPO" && PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    FT_BATCH="${FT_BATCH:-16}" FT_EVAL_N=32 \
    FT_LR="${FT_LR:-2.5e-5}" FT_DEGRADE_P="${FT_DEGRADE_P:-0.35}" \
    python -u scripts/finetune_robust.py \
    "$SEG_END" data_cache/pool_90k.npz data_cache/pool_b_24k.npz \
    "$OUT" ) >> "$LOG" 2>&1 &
  FT=$!
  echo "$FT" > /tmp/cpu_ft_stage.pid
  while kill -0 "$FT" 2>/dev/null; do
    sleep 60
    if tunnel_up; then
      note "tunnel up mid-segment — killing ft (last segment ckpt stands)"
      kill "$FT" 2>/dev/null; sleep 10; kill -9 "$FT" 2>/dev/null
      exit 0
    fi
  done
  wait "$FT" 2>/dev/null
  note "segment done rc=$?"
done

# Post-ft small-n degraded bench, tunnel permitting.
if ! tunnel_up && [ -d "$OUT" ]; then
  note "degraded_bench 48 on $OUT"
  ( cd "$REPO" && PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -u scripts/degraded_bench.py 48 "$OUT" ) \
    >> "$REPO/logs/degraded_r4_cpu48_robustcpu.log" 2>&1
  note "degraded_bench rc=$?"
fi
note "complete"
