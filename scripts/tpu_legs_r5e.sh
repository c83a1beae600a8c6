#!/bin/bash
# Round-5 leg chain E — record the quality-curve point at the final
# vocoder checkpoint: the sc24k leg was budget-killed at counter 10000
# (22k effective, save_every=2000 kept it), so its end-of-leg eval never
# ran. --steps <counter> restores and trains 0, i.e. eval-only.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set an absolute epoch deadline}
echo "== tpu_legs_r5e start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

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
  echo "-- leg $name rc=$? end $(date -u +%H:%M:%S)" >> "$LOG"
}

STEP=$(python -c "
import json, pathlib
p = pathlib.Path('eval_results/ckpt_sc/vocoder_quality/meta.json')
print(json.loads(p.read_text())['step'] if p.exists() else 0)" 2>/dev/null || echo 0)
if [ "$STEP" -gt 6000 ]; then
  EFF=$(( (12000 + STEP) / 1000 ))
  run_leg voc_eval_sc${EFF}k 1200 python -m ttsx.eval.parity_aux \
    --exp vocoder_quality --steps $STEP \
    --save-dir eval_results/ckpt_sc \
    --override lambda_energy=1.0 --override scale_cond=true \
    --key vocoder_quality_sc${EFF}k
else
  echo "-- voc eval SKIPPED (counter $STEP)" >> "$LOG"
fi

echo "== tpu_legs_r5e done $(date -u +%H:%M:%S)" >> "$LOG"
