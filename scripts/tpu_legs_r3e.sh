#!/bin/bash
# Round-3 session-3 leg chain (the r3c/r3d chains died with the previous
# container before running; the Orbax trees under eval_results/ckpt_* died
# with it — every leg here resumes from the git-tracked slim exports).
#   1. scale_gain v2 retake (VERDICT r2 next #1): tanh-bounded log-gain
#      head (scale_gain_max=0.7), reforked from the 6k scale_cond slim.
#      Target: rms_ratio_ema >= 0.95 without STFT log-L1 regression.
#   2. e2e refresh on that vocoder (VERDICT r2 next #3+#4): text->wav at
#      the current-best checkpoint incl. the SDE-sampled readout. The
#      existing e2e_scale_gain entry rode the BROKEN unbounded-gain ckpt.
#   3. formant-EER two-factor probe (next #8): SpecAugment (the 12.8k
#      unaugmented leg REGRESSED 10.0% -> 16.7% at train loss 1.5e-6 —
#      pure memorization) x richer speaker cues (formant_rich corpus).
#   4. prosody data-scale leg (next #5): 8x utterances for the
#      energy-head overfit.
#   5. on-device kernel A/B (weak #5): promote-or-delete mel/S4 kernels.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 5700 ))}
echo "== tpu_legs_r3e start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

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

# refork: the tracked ckpt_sg_slim.npz is the destabilized v1 output;
# v2 restarts from the healthy 6k scale_cond checkpoint.
rm -rf eval_results/ckpt_sg
cp -f eval_results/ckpt_sc_slim.npz eval_results/ckpt_sg_slim.npz
run_leg voc_scale_gain_v2 2700 python -m ttsx.eval.parity_aux \
  --exp vocoder_quality --steps 6000 \
  --save-dir eval_results/ckpt_sg \
  --override lambda_energy=1.0 --override scale_cond=true \
  --override scale_gain=true \
  --key vocoder_quality_scale_gain6k_v2

run_leg e2e_scale_gain_v2 2700 python -m ttsx.eval.parity_aux --exp e2e \
  --arg vocoder_save_dir='"eval_results/ckpt_sg"' \
  --arg vocoder_steps=6000 \
  --arg vocoder_overrides='{"lambda_energy": 1.0, "scale_cond": true, "scale_gain": true}' \
  --key e2e_scale_gain_v2

run_leg refenc_formant_aug 500 python -m ttsx.eval.parity_aux \
  --exp refenc --steps 3200 --arg corpus='"formant"' \
  --arg utts_train=32 --key refenc_formant_aug3200

run_leg refenc_formant_rich 500 python -m ttsx.eval.parity_aux \
  --exp refenc --steps 3200 --arg corpus='"formant_rich"' \
  --arg utts_train=32 --key refenc_formant_rich_3200

run_leg prosody_8k_data8x 1200 python -m ttsx.eval.parity_aux \
  --exp prosody --steps 8000 --arg utts_train=480 --arg n_speakers=12 \
  --key prosody_8k_data8x

run_leg kernel_ab 900 python scripts/kernel_ab.py

echo "== tpu_legs_r3e done $(date -u +%H:%M:%S)" >> "$LOG"
