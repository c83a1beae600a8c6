#!/bin/bash
# Session-6 (round-2 wrap) TPU legs: formant-corpus (speech-shaped)
# parity numbers that tpu_legs_s5.sh queued but never got to run (the
# box rebooted between sessions). Hard-deadline bounded: each leg's
# timeout is the time remaining, so nothing outlives the session and
# collides with the driver's bench run (one TPU process at a time).
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 2700 ))}  # default +45m
echo "== tpu_legs_s6 start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

run_leg() {
  local name="$1"; shift
  local left=$(( DEADLINE_EPOCH - $(date +%s) ))
  if [ "$left" -le 120 ]; then
    echo "-- leg $name SKIPPED (past deadline) $(date -u +%H:%M:%S)" >> "$LOG"
    return 0
  fi
  echo "-- leg $name start $(date -u +%H:%M:%S) budget ${left}s" >> "$LOG"
  timeout "$left" python -m ttsx.eval.parity_aux "$@" >> "$LOG" 2>&1
  echo "-- leg $name rc=$? end $(date -u +%H:%M:%S)" >> "$LOG"
}

# 1. speaker EER on formant speech (identity = vocal-tract scale)
run_leg refenc_formant --exp refenc --arg corpus='"formant"' \
  --key refenc_formant

# 2. acoustic text->mel MCD on formant speech
run_leg acoustic_formant --exp acoustic --arg corpus='"formant"' \
  --key acoustic_formant

# 3. vocoder wav-domain quality on formant speech, warm-started from the
#    84k tone-trained slim generator (transfer leg; ckpt_f0_slim.npz is a
#    copy of ckpt_e0_slim.npz made by the launcher)
run_leg voc3k_f0warm --exp vocoder_quality --steps 3000 \
  --save-dir eval_results/ckpt_f0 --override lambda_energy=1.0 \
  --arg corpus='"formant"' --key vocoder_quality_3k_f0warm

echo "== tpu_legs_s6 done $(date -u +%H:%M:%S)" >> "$LOG"
