#!/bin/bash
# Session-4 TPU training legs (round-2 wrap-up). Continues the e0
# cumulative vocoder curve (lambda_energy=1.0 from step 0, ckpt_e0 at
# 72k at session start), adds a lambda_energy=5.0 fork to test whether
# the rms_ratio plateau (~0.70) is an under-weighting problem, refreshes
# the e2e chain number on the strong 84k e0 checkpoint (old chain number
# used the 24k vocoder), and runs the queued-but-never-run prosody
# log-energy data-scale leg. Exactly ONE TPU JAX process at a time.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
CKPT=eval_results/ckpt_e0
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 32400 ))}  # default +9h
echo "== tpu_legs_s4 start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

probe() {
  for i in $(seq 1 60); do
    if timeout 120 python -c "import jax; jax.devices()" >> "$LOG" 2>&1; then
      return 0
    fi
    echo "probe $i failed $(date -u +%H:%M:%S)" >> "$LOG"
    sleep 180
  done
  return 1
}

run_leg() {
  local name="$1"; shift
  if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "-- leg $name SKIPPED (past deadline) $(date -u +%H:%M:%S)" >> "$LOG"
    return 0
  fi
  probe || { echo "-- leg $name SKIPPED (tunnel down)" >> "$LOG"; return 1; }
  echo "-- leg $name start $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 10800 python -m ttsx.eval.parity_aux "$@" >> "$LOG" 2>&1
  echo "-- leg $name rc=$? end $(date -u +%H:%M:%S)" >> "$LOG"
}

# 1. e0 curve 72k -> 84k
run_leg voc84k_e0 --exp vocoder_quality --steps 84000 \
  --save-dir "$CKPT" --override lambda_energy=1.0 \
  --key vocoder_quality_84k_e0

# 2. lambda_energy=5.0 fork from the 84k e0 checkpoint: does the
#    rms_ratio plateau respond to the weight?
if [ -d "$CKPT" ] && [ ! -d eval_results/ckpt_e5 ]; then
  cp -r "$CKPT" eval_results/ckpt_e5
fi
run_leg voc96k_e5fork --exp vocoder_quality --steps 96000 \
  --save-dir eval_results/ckpt_e5 --override lambda_energy=5.0 \
  --key vocoder_quality_96k_e5fork

# 3. e2e chain refresh on the 84k e0 vocoder + slim zoo export
run_leg e2e84k --exp e2e --arg acoustic_steps=12000 --arg refiner_steps=4800 \
  --arg vocoder_steps=84000 --arg vocoder_save_dir='"eval_results/ckpt_e0"' \
  --arg zoo_dir='"eval_results/zoo_e2e"' --key e2e_84k_e0

# 4. prosody log-energy target at doubled data
run_leg prosody8kds --exp prosody --steps 8000 --arg utts_train=120 \
  --key prosody_8k_logE_ds120

# 5-6. e0 curve 84k -> 96k -> 108k (deadline-gated)
run_leg voc96k_e0 --exp vocoder_quality --steps 96000 \
  --save-dir "$CKPT" --override lambda_energy=1.0 \
  --key vocoder_quality_96k_e0
run_leg voc108k_e0 --exp vocoder_quality --steps 108000 \
  --save-dir "$CKPT" --override lambda_energy=1.0 \
  --key vocoder_quality_108k_e0

echo "== tpu_legs_s4 legs done $(date -u +%H:%M:%S)" >> "$LOG"
