#!/bin/bash
# Round-3 leg batch C (runs after r3b):
#   1. prosody data-scale leg (VERDICT r2 next #5): the energy-head
#      regression is overfit on 60 synthetic utterances (val_loss rises
#      while train falls; the target itself is smooth, lag-1 autocorr
#      0.93) — the corpus is synthetic and unlimited, so scale the data
#      8x. Best-val selection is already the recorded number.
#   2. scale_cond continuation 6k->12k (comparison arm for the
#      scale_gain fork: same total step budget, FiLM-only lever).
#   3. on-device kernel A/B (VERDICT r2 weak #5): promote or delete the
#      mel + S4 pallas kernels with amortized-dispatch device timing.
#   4. formant e2e chain (VERDICT r2 next #2): full text->wav on the
#      speech-shaped corpus, vocoder resumed from the cumulative
#      ckpt_f0 tree.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 10800 ))}  # default +3h
echo "== tpu_legs_r3c start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

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

# bounded-gain retake: the unbounded exp(gain) fork destabilized the GAN
# (adv tail 0.24 -> 1.22, wav MCD 56.7 -> 146 dB). Refork from the 6k
# scale_cond slim with the tanh-bounded head (scale_gain_max 0.7).
rm -rf eval_results/ckpt_sg
cp -f eval_results/ckpt_sc_slim.npz eval_results/ckpt_sg_slim.npz
run_leg voc_scale_gain_v2 3000 python -m ttsx.eval.parity_aux \
  --exp vocoder_quality --steps 6000 \
  --save-dir eval_results/ckpt_sg \
  --override lambda_energy=1.0 --override scale_cond=true \
  --override scale_gain=true \
  --key vocoder_quality_scale_gain6k_v2

run_leg prosody_8k_data8x 2400 python -m ttsx.eval.parity_aux \
  --exp prosody --steps 8000 --arg utts_train=480 --arg n_speakers=12 \
  --key prosody_8k_data8x

run_leg kernel_ab 900 python scripts/kernel_ab.py

run_leg e2e_formant 3300 python -m ttsx.eval.parity_aux --exp e2e \
  --arg corpus='"formant"' \
  --arg vocoder_save_dir='"eval_results/ckpt_f0"' \
  --arg vocoder_steps=12000 \
  --arg vocoder_overrides='{"lambda_energy": 1.0}' \
  --key e2e_formant

echo "== tpu_legs_r3c done $(date -u +%H:%M:%S)" >> "$LOG"
