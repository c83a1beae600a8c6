#!/bin/bash
# Round-5 leg chain D — e2e headline retake with a budget that fits:
# the 1800 s e2e legs in r5a timed out because acoustic (4000 steps) +
# refiner (2400) retrain from scratch each round (their Orbax trees die
# with the clone); only the vocoder restores. 3600 s covers the measured
# ~35-45 min. Runs the retake at the BEST vocoder checkpoint counter and
# refreshes eval_results/zoo (acoustic/refiner/vocoder npz + zoo.json
# with effective steps).
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set an absolute epoch deadline}
echo "== tpu_legs_r5d start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "-- prior chain (pid $WAIT_PID) done $(date -u +%H:%M:%S)" >> "$LOG"
fi

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
  local rc=$?
  echo "-- leg $name rc=$rc end $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

STEP=$(python -c "
import json, pathlib
p = pathlib.Path('eval_results/ckpt_sc/vocoder_quality/meta.json')
print(json.loads(p.read_text())['step'] if p.exists() else 0)" 2>/dev/null || echo 0)
if [ "$STEP" -gt 0 ]; then
  EFF=$(( (12000 + STEP) / 1000 ))
  run_leg e2e_sc${EFF}k 3600 python -m ttsx.eval.parity_aux \
    --exp e2e --key e2e_sc${EFF}k \
    --override lambda_energy=1.0 --override scale_cond=true \
    --arg vocoder_save_dir='"eval_results/ckpt_sc"' \
    --arg vocoder_steps=$STEP \
    --arg zoo_dir='"eval_results/zoo"' \
    --arg stage_ckpt_dir='"eval_results/ckpt_e2e"'
  if [ $? -eq 124 ]; then
    # budget-killed: stage checkpoints make a resume retry cheap
    run_leg e2e_sc${EFF}k_retry 3600 python -m ttsx.eval.parity_aux \
      --exp e2e --key e2e_sc${EFF}k \
      --override lambda_energy=1.0 --override scale_cond=true \
      --arg vocoder_save_dir='"eval_results/ckpt_sc"' \
      --arg vocoder_steps=$STEP \
      --arg zoo_dir='"eval_results/zoo"' \
      --arg stage_ckpt_dir='"eval_results/ckpt_e2e"'
  fi
else
  echo "-- e2e retake SKIPPED (no vocoder checkpoint)" >> "$LOG"
fi

echo "== tpu_legs_r5d done $(date -u +%H:%M:%S)" >> "$LOG"
