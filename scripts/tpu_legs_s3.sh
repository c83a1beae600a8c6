#!/bin/bash
# Session-3 TPU training legs. The round-2 cumulative checkpoints did NOT
# survive the round boundary (eval_results/ckpt* is gitignored and the
# driver starts from a fresh clone), so this rebuilds the vocoder quality
# curve from scratch with the lambda_energy lever ON from step 0 (round 2
# only enabled it for the 72k->84k fork and saw rms_ratio 0.68 -> 0.72
# with STFT log-L1 still improving).
#
# Chunked legs (12k steps each) = incremental Orbax checkpoints: the
# harness only saves at leg end, so chunking bounds the loss from a
# tunnel outage to one chunk. Exactly ONE TPU JAX process at a time.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
CKPT=eval_results/ckpt_e0
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 30600 ))}  # default +8.5h
echo "== tpu_legs_s3 start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

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

for STEPS in 12000 24000 36000 48000 60000 72000; do
  K=$(( STEPS / 1000 ))
  run_leg "voc${K}k" --exp vocoder_quality --steps "$STEPS" \
    --save-dir "$CKPT" --override lambda_energy=1.0 \
    --key "vocoder_quality_${K}k_e0"
done

echo "== tpu_legs_s3 legs done $(date -u +%H:%M:%S)" >> "$LOG"
