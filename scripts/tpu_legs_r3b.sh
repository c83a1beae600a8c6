#!/bin/bash
# Round-3 leg batch B:
#   1. scale_gain fork (the DIRECT absolute-level head, zero-init log-gain
#      post-tanh): warm-start G+GST from the 6k scale_cond slim and train
#      6k steps with scale_cond+scale_gain+lambda_energy. Target: the
#      VERDICT r2 goal rms_ratio_ema >= 0.95 without STFT regression.
#   2. e2e refresh at the current-best vocoder (VERDICT r2 weak #1 /
#      next #4) with the SDE-sampled readout (missing #2): the vocoder
#      resumes ckpt_sg cumulative, acoustic/refiner retrain.
#   3. formant refenc 12.8k / 2x data (next #8): drive the EER curve to
#      a verdict.
#   4. formant vocoder 6k -> 12k (next #2): extend the speech-shaped
#      quality curve via the cumulative ckpt_f0 tree.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 14400 ))}  # default +4h
echo "== tpu_legs_r3b start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

run_leg() {
  local name="$1" budget="$2"; shift 2
  local left=$(( DEADLINE_EPOCH - $(date +%s) ))
  [ "$budget" -gt "$left" ] && budget=$left
  if [ "$budget" -le 120 ]; then
    echo "-- leg $name SKIPPED (past deadline) $(date -u +%H:%M:%S)" >> "$LOG"
    return 0
  fi
  echo "-- leg $name start $(date -u +%H:%M:%S) budget ${budget}s" >> "$LOG"
  timeout "$budget" python -m ttsx.eval.parity_aux "$@" >> "$LOG" 2>&1
  echo "-- leg $name rc=$? end $(date -u +%H:%M:%S)" >> "$LOG"
}

# fork the 6k scale_cond checkpoint into the scale_gain branch (slim
# warm-start: G+GST load; zero-init gain_proj keeps the forward identical
# at step 0)
[ -f eval_results/ckpt_sg_slim.npz ] || \
  cp eval_results/ckpt_sc_slim.npz eval_results/ckpt_sg_slim.npz

run_leg voc_scale_gain6k 3000 --exp vocoder_quality --steps 6000 \
  --save-dir eval_results/ckpt_sg \
  --override lambda_energy=1.0 --override scale_cond=true \
  --override scale_gain=true \
  --key vocoder_quality_scale_gain6k

run_leg e2e_scale_gain 3300 --exp e2e \
  --arg vocoder_save_dir='"eval_results/ckpt_sg"' \
  --arg vocoder_steps=6000 \
  --arg vocoder_overrides='{"lambda_energy": 1.0, "scale_cond": true, "scale_gain": true}' \
  --key e2e_scale_gain

run_leg refenc_formant_12k8 2400 --exp refenc --steps 12800 \
  --arg corpus='"formant"' --arg utts_train=64 \
  --key refenc_formant_12k8

run_leg voc12k_f0warm 3000 --exp vocoder_quality --steps 12000 \
  --save-dir eval_results/ckpt_f0 --override lambda_energy=1.0 \
  --arg corpus='"formant"' --key vocoder_quality_12k_f0warm

echo "== tpu_legs_r3b done $(date -u +%H:%M:%S)" >> "$LOG"
