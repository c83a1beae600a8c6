#!/bin/bash
# Round-4 leg chain E (final):
#   1. kernel A/B promote-or-delete (VERDICT r3 next #5) — r4b run died
#      on a missing sys.path (fixed); timing fence now uses an honest
#      float() transfer (block_until_ready lies through the axon tunnel).
#   2. generator decomposition retake (VERDICT r3 next #8) — r4d run
#      died tracing the attn-identity variant outside the patch scope
#      (fixed: AOT lower/compile inside the patched region).
# Deadline-capped hard: the driver's end-of-round bench needs the TPU.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -u -d "today 08:55" +%s)}
echo "== tpu_legs_r4e start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

probe() { timeout -k 30 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; }
n=0
until probe; do
  n=$((n + 1))
  echo "-- tunnel probe failed ($n) $(date -u +%H:%M:%S)" >> "$LOG"
  [ "$n" -ge 3 ] && { echo "-- tunnel DOWN, aborting chain" >> "$LOG"; exit 1; }
  sleep 120
done

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

run_leg kernel_ab 1100 python scripts/kernel_ab.py
run_leg gen_profile 1500 python scripts/gen_profile.py

echo "== tpu_legs_r4e done $(date -u +%H:%M:%S)" >> "$LOG"
