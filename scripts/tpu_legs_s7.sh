#!/bin/bash
# Session-6 follow-up queue: runs after tpu_legs_s6.sh drains (pid in
# /tmp/legs_s6.pid). The 800-step formant refenc leg landed EER 0.145 —
# clearly undertrained (tone corpus reaches 0.006 at the same budget);
# retrain at 4x steps / 2x data. Then retry the warm-started formant
# vocoder leg if time remains.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 3000 ))}  # default +50m
echo "== tpu_legs_s7 start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

if [ -f /tmp/legs_s6.pid ]; then
  S6=$(cat /tmp/legs_s6.pid)
  while kill -0 "$S6" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
      echo "== tpu_legs_s7 aborted: s6 still running at deadline" >> "$LOG"
      exit 1
    fi
    sleep 30
  done
fi
echo "== s6 drained; s7 legs begin $(date -u +%H:%M:%S)" >> "$LOG"

run_leg() {
  local name="$1"; shift
  local left=$(( DEADLINE_EPOCH - $(date +%s) ))
  if [ "$left" -le 120 ]; then
    echo "-- leg $name SKIPPED (past deadline) $(date -u +%H:%M:%S)" >> "$LOG"
    return 0
  fi
  echo "-- leg $name start $(date -u +%H:%M:%S) budget ${left}s" >> "$LOG"
  timeout "$left" python -m ttsx.eval.parity_aux "$@" >> "$LOG" 2>&1
  echo "-- leg $name rc=$? end $(date -u +%H:%M:%S)" >> "$LOG"
}

run_leg refenc_formant_3200 --exp refenc --steps 3200 \
  --arg corpus='"formant"' --arg utts_train=32 \
  --key refenc_formant_3200

run_leg voc3k_f0warm --exp vocoder_quality --steps 3000 \
  --save-dir eval_results/ckpt_f0 --override lambda_energy=1.0 \
  --arg corpus='"formant"' --key vocoder_quality_3k_f0warm

echo "== tpu_legs_s7 done $(date -u +%H:%M:%S)" >> "$LOG"
