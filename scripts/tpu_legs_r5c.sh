#!/bin/bash
# Round-5 leg chain C — final capture pass after the quality legs:
#   1. gen_profile retake (kernel-v2 device split, fresh entry)
#   2. bench.py capture (validates the hardened probe/failure path and
#      gives a builder-side RTF datapoint before the driver's own run)
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set an absolute epoch deadline}
echo "== tpu_legs_r5c start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

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

run_leg gen_profile 1500 python scripts/gen_profile.py
run_leg bench 900 python bench.py

echo "== tpu_legs_r5c done $(date -u +%H:%M:%S)" >> "$LOG"
