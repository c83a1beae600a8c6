#!/bin/bash
# Round-4 leg chain A (VERDICT r3 next #2 + #7):
#   1. vocoder scale_cond continuation: warm-start from the tracked
#      ckpt_sc slim (6k trained) and train 6000 MORE steps -> effective
#      12k. Records vocoder_quality_sc12k and leaves a live Orbax tree
#      at eval_results/ckpt_sc for leg 2 to reuse without retraining.
#   2. e2e chain re-run on that best vocoder (the r3 headline was
#      measured on the known-destabilized scale_gain-v1 checkpoint) +
#      zoo export: eval_results/zoo/{acoustic,refiner,vocoder}.npz +
#      zoo.json so a fresh clone can synthesize (zoo.py's contract).
#
# ADVICE r3 compliance: tunnel probe before any leg; timeout -k so a
# hung leg is SIGKILLed before the next leg's TPU process starts; no
# destructive refork operations outside the skip-guard.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 19800 ))}
echo "== tpu_legs_r4a start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

# TPU tunnel probe (ADVICE r3 low #3): a down tunnel hangs rather than
# fails; don't let legs burn their budgets hanging. Retry up to 20 min.
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

# 1. scale_cond 6k -> 12k effective (slim warm-start; ~0.29 s/step GAN)
run_leg voc_sc12k 2850 python -m ttsx.eval.parity_aux \
  --exp vocoder_quality --steps 6000 \
  --save-dir eval_results/ckpt_sc \
  --override lambda_energy=1.0 --override scale_cond=true \
  --key vocoder_quality_sc12k

# 2. e2e headline on the best checkpoint + zoo export (vocoder_steps
# matches leg 1's saved cumulative count so it restores, trains 0)
run_leg e2e_sc 2850 python -m ttsx.eval.parity_aux \
  --exp e2e --key e2e_scale_cond \
  --override lambda_energy=1.0 --override scale_cond=true \
  --arg vocoder_save_dir='"eval_results/ckpt_sc"' \
  --arg vocoder_steps=6000 \
  --arg zoo_dir='"eval_results/zoo"'

echo "== tpu_legs_r4a done $(date -u +%H:%M:%S)" >> "$LOG"
# chain into r4b if it exists by then (written while legs run)
if [ -x scripts/tpu_legs_r4b.sh ]; then
  DEADLINE_EPOCH=$DEADLINE_EPOCH bash scripts/tpu_legs_r4b.sh
fi
