#!/bin/bash
# Session-4 part 2: formant-corpus (speech-shaped) parity legs. Waits for
# the s4 queue (PID in /tmp/legs_s4.pid) to drain first — exactly ONE TPU
# JAX process at a time. Measures EER / MCD / wav-domain vocoder quality
# under wideband source-filter audio (ttsx/data/formantcorpus.py) instead
# of narrowband tones.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 39600 ))}  # default +11h
echo "== tpu_legs_s5 start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

# wait for the s4 queue to exit (poll its pid)
if [ -f /tmp/legs_s4.pid ]; then
  S4=$(cat /tmp/legs_s4.pid)
  while kill -0 "$S4" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
      echo "== tpu_legs_s5 aborted: s4 still running at deadline" >> "$LOG"
      exit 1
    fi
    sleep 60
  done
fi
echo "== s4 queue drained; s5 legs begin $(date -u +%H:%M:%S)" >> "$LOG"

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

# 1. speaker EER on formant speech (shared-f0 groups: identity = VTL)
run_leg refenc_formant --exp refenc --arg corpus='"formant"' \
  --key refenc_formant

# 2. acoustic text->mel MCD on formant speech
run_leg acoustic_formant --exp acoustic --arg corpus='"formant"' \
  --key acoustic_formant

# 3-4. vocoder wav-domain quality curve on formant speech (fresh branch)
run_leg voc12k_f0 --exp vocoder_quality --steps 12000 \
  --save-dir eval_results/ckpt_f0 --override lambda_energy=1.0 \
  --arg corpus='"formant"' --key vocoder_quality_12k_f0
run_leg voc24k_f0 --exp vocoder_quality --steps 24000 \
  --save-dir eval_results/ckpt_f0 --override lambda_energy=1.0 \
  --arg corpus='"formant"' --key vocoder_quality_24k_f0

echo "== tpu_legs_s5 legs done $(date -u +%H:%M:%S)" >> "$LOG"
