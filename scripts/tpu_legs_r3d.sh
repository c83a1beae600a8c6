#!/bin/bash
# Round-3 leg batch D (final; runs after r3c):
#   1. e2e tone retake on the bounded-gain vocoder (the r3b e2e rode the
#      broken unbounded-gain checkpoint): fresh text->wav + SDE-vs-
#      deterministic readouts at the current best vocoder (VERDICT r2
#      next #3 + #4).
#   2. refenc on formant_rich (VERDICT r2 next #8 contingency): does
#      per-speaker voice quality (breathiness/tilt/vibrato) unlock the
#      EER plateau VTL-only identity caps?
#   3. bench.py: validate the new MFU + dispatch-split fields land in
#      the JSON line before the driver's end-of-round capture.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 7200 ))}  # default +2h
echo "== tpu_legs_r3d start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

run_leg() {
  local name="$1" budget="$2"; shift 2
  local left=$(( DEADLINE_EPOCH - $(date +%s) ))
  [ "$budget" -gt "$left" ] && budget=$left
  if [ "$budget" -le 120 ]; then
    echo "-- leg $name SKIPPED (past deadline) $(date -u +%H:%M:%S)" >> "$LOG"
    return 0
  fi
  echo "-- leg $name start $(date -u +%H:%M:%S) budget ${budget}s" >> "$LOG"
  timeout "$budget" "$@" >> "$LOG" 2>&1
  echo "-- leg $name rc=$? end $(date -u +%H:%M:%S)" >> "$LOG"
}

run_leg e2e_scale_gain_v2 3300 python -m ttsx.eval.parity_aux --exp e2e \
  --arg vocoder_save_dir='"eval_results/ckpt_sg"' \
  --arg vocoder_steps=6000 \
  --arg vocoder_overrides='{"lambda_energy": 1.0, "scale_cond": true, "scale_gain": true}' \
  --key e2e_scale_gain_v2

# two-factor EER probe: SpecAugment (anti-memorization — the 12.8k
# unaugmented leg REGRESSED to 16.7% at loss 1.5e-6) x richer speaker
# cues (formant_rich). specaugment defaults True now.
run_leg refenc_formant_aug 1500 python -m ttsx.eval.parity_aux \
  --exp refenc --steps 3200 --arg corpus='"formant"' \
  --arg utts_train=32 --key refenc_formant_aug3200

run_leg refenc_formant_rich 1500 python -m ttsx.eval.parity_aux \
  --exp refenc --steps 3200 --arg corpus='"formant_rich"' \
  --arg utts_train=32 --key refenc_formant_rich_3200

run_leg bench 900 python bench.py

echo "== tpu_legs_r3d done $(date -u +%H:%M:%S)" >> "$LOG"
