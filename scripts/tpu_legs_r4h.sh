#!/bin/bash
# Round-4 leg chain H: measure resblock-kernel v2 on device, then the
# hard-diarizer retake on the fixed production stack (speech-mask clip,
# no tcn at window granularity, peak-window overlap emission).
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -u -d "today 15:30" +%s)}
echo "== tpu_legs_r4h start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_leg() {
  local name="$1" budget="$2"; shift 2
  local left=$(( DEADLINE_EPOCH - $(date +%s) ))
  [ "$budget" -gt "$left" ] && budget=$left
  if [ "$budget" -le 120 ]; then
    echo "-- leg $name SKIPPED (past deadline) $(date -u +%H:%M:%S)" >> "$LOG"
    return 0
  fi
  echo "-- leg $name start $(date -u +%H:%M:%S) budget ${budget}s" >> "$LOG"
  timeout -k 30 "$budget" "$@" >> "$LOG" 2>&1
  echo "-- leg $name rc=$? end $(date -u +%H:%M:%S)" >> "$LOG"
}

probe || { echo "-- TPU probe FAILED $(date -u +%H:%M:%S)" >> "$LOG"; exit 1; }

run_leg gen_profile_v2 1500 python scripts/gen_profile.py

run_leg diarizer_hard_v2 2100 python -m ttsx.eval.parity_aux \
  --exp diarizer_hard --out eval_results/parity_diar.json \
  --key diarizer_hard

echo "== tpu_legs_r4h done $(date -u +%H:%M:%S)" >> "$LOG"
