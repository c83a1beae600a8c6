#!/bin/bash
# Round-4 leg chain D:
#   1. vocoder scale_cond continuation 12k -> 18k effective (cumulative
#      resume of eval_results/ckpt_sc; quality curve still descending).
#   2. generator device-time decomposition + refiner compile watch
#      (VERDICT r3 next #8).
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 14000 ))}
echo "== tpu_legs_r4d start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

probe() { timeout -k 30 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; }
n=0
until probe; do
  n=$((n + 1))
  echo "-- tunnel probe failed ($n) $(date -u +%H:%M:%S)" >> "$LOG"
  [ "$n" -ge 10 ] && { echo "-- tunnel DOWN, aborting chain" >> "$LOG"; exit 1; }
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

# 1. sc 12k -> 18k effective (ckpt_sc Orbax counter is at 6000 after the
# r4a warm-start fork; +6000 more = 18k total training on these params)
run_leg voc_sc18k 2850 python -m ttsx.eval.parity_aux \
  --exp vocoder_quality --steps 12000 \
  --save-dir eval_results/ckpt_sc \
  --override lambda_energy=1.0 --override scale_cond=true \
  --key vocoder_quality_sc18k

# 2. generator decomposition probe
run_leg gen_profile 1500 python scripts/gen_profile.py

echo "== tpu_legs_r4d done $(date -u +%H:%M:%S)" >> "$LOG"
if [ -x scripts/tpu_legs_r4e.sh ]; then
  DEADLINE_EPOCH=$DEADLINE_EPOCH bash scripts/tpu_legs_r4e.sh
fi
