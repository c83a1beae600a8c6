#!/bin/bash
# Round-4 leg chain J (session 3 retake): the r4i leg's first TPU contact
# hung in futex_do_wait right after the tunnel probe exited (2.5 s CPU in
# 11 min — a probe-disconnect race, not slowness), so this retake skips
# the separate probe process entirely and sizes the continuation to the
# remaining session window: scale_cond 12k -> 15k effective (slim-only
# warm start, fresh discs), save_every=2000 keeps progress on timeout.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set an absolute epoch deadline}
echo "== tpu_legs_r4j start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

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

run_leg voc_sc15k 1500 python -m ttsx.eval.parity_aux \
  --exp vocoder_quality --steps 3000 \
  --save-dir eval_results/ckpt_sc \
  --override lambda_energy=1.0 --override scale_cond=true \
  --key vocoder_quality_sc15k

echo "== tpu_legs_r4j done $(date -u +%H:%M:%S)" >> "$LOG"
