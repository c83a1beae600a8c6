#!/bin/bash
# Sequential TPU training legs for the round-2 quality curve.
# Exactly ONE TPU JAX process at a time (two deadlock on the axon
# tunnel — CLAUDE.md). Probes until the tunnel answers, then runs the
# queued legs back-to-back, logging to /tmp/tpu_jobs.log.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
echo "== tpu_legs start $(date -u +%H:%M:%S)" >> "$LOG"

# wait for the tunnel (probe once per 3 min, up to ~7 h)
up=0
for i in $(seq 1 140); do
  if timeout 120 python -c "import jax; jax.devices()" >> "$LOG" 2>&1; then
    up=1; echo "TPU up at $(date -u +%H:%M:%S) (attempt $i)" >> "$LOG"; break
  fi
  echo "probe $i failed $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 180
done
if [ "$up" != 1 ]; then echo "TPU never came up; aborting" >> "$LOG"; exit 1; fi

run_leg() {
  local name="$1"; shift
  echo "-- leg $name start $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 10800 python -m ttsx.eval.parity_aux "$@" >> "$LOG" 2>&1
  echo "-- leg $name rc=$? end $(date -u +%H:%M:%S)" >> "$LOG"
}

# 1. vocoder quality curve: continue the lambda_energy branch 84k -> 96k
run_leg voc96k --exp vocoder_quality --steps 96000 \
  --save-dir eval_results/ckpt_energy --override lambda_energy=1.0 \
  --key vocoder_quality_96k_energy

# 2. e2e refresh: stronger front-end (acoustic 12k, refiner 4.8k) chained
#    onto the 96k cumulative vocoder checkpoint
run_leg e2e96k --exp e2e --arg acoustic_steps=12000 --arg refiner_steps=4800 \
  --arg vocoder_steps=96000 \
  --arg vocoder_save_dir='"eval_results/ckpt_energy"' --key e2e_96k

# 3. prosody with the log-domain energy target + doubled data
run_leg prosody8kds --exp prosody --steps 8000 --arg utts_train=120 \
  --key prosody_8k_logE_ds120

# 4. vocoder 96k -> 108k
run_leg voc108k --exp vocoder_quality --steps 108000 \
  --save-dir eval_results/ckpt_energy --override lambda_energy=1.0 \
  --key vocoder_quality_108k_energy

echo "== tpu_legs done $(date -u +%H:%M:%S)" >> "$LOG"
