#!/bin/bash
# Round-4 leg chain B:
#   1. e2e chain re-run on the best (sc12k) vocoder + zoo export —
#      r4a's attempt hit its 2850s cap (acoustic 4000 + refiner 2400
#      + eval needs ~3000-3300s; round 3 used 3300); give it 4500.
#   2. kernel A/B promote-or-delete for the mel/S4 Pallas kernels
#      (VERDICT r3 next #5 — two rounds parity-proven-only).
# Chains into r4c if present (written while these run).
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 21000 ))}
echo "== tpu_legs_r4b start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

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

# 1. e2e headline on the sc12k vocoder + zoo export (ckpt_sc Orbax tree
# carries cumulative steps=6000 from r4a leg 1, so vocoder trains 0)
run_leg e2e_sc 4500 python -m ttsx.eval.parity_aux \
  --exp e2e --key e2e_scale_cond \
  --override lambda_energy=1.0 --override scale_cond=true \
  --arg vocoder_save_dir='"eval_results/ckpt_sc"' \
  --arg vocoder_steps=6000 \
  --arg zoo_dir='"eval_results/zoo"'

# 2. mel/S4 Pallas kernel A/B (promote or delete)
run_leg kernel_ab 1200 python scripts/kernel_ab.py

echo "== tpu_legs_r4b done $(date -u +%H:%M:%S)" >> "$LOG"
if [ -x scripts/tpu_legs_r4c.sh ]; then
  DEADLINE_EPOCH=$DEADLINE_EPOCH bash scripts/tpu_legs_r4c.sh
fi
