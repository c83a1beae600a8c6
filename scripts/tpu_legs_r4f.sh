#!/bin/bash
# Round-4 leg chain F: hard-diarizer retake on the reworked stack
# (uniform 1 s sub-segmentation + spectral clustering w/ eigengap count
# + prototype second-speaker overlap labeling), then gen_profile if any
# budget remains (it usually won't — the driver's bench needs the TPU).
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -u -d "today 08:57" +%s)}
echo "== tpu_legs_r4f start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

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

run_leg diarizer_hard_r4f 2100 python -m ttsx.eval.parity_aux \
  --exp diarizer_hard --out eval_results/parity_diar.json \
  --key diarizer_hard

run_leg gen_profile 1500 python scripts/gen_profile.py

echo "== tpu_legs_r4f done $(date -u +%H:%M:%S)" >> "$LOG"
