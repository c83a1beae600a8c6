#!/bin/bash
# Round-3 session-1 leg batch A (VERDICT r2 next-round items 1 + 2):
#   1. scale_cond fork: warm-start G+GST from the tone e0 84k slim and
#      train 6k steps WITH the absolute-scale conditioning channel on
#      (VocoderConfig.scale_cond, zero-init scale_proj -> FiLM). Target:
#      rms_ratio_ema toward >= 0.95 without STFT log-L1 regression.
#   2. formant-corpus vocoder quality: the two round-2 attempts died at
#      rc=124 under ~11-min budgets; give the leg a real one. Cumulative
#      save_dir so later sessions extend it.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 5400 ))}  # default +90m
echo "== tpu_legs_r3a start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

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

# fork the e0 84k tone checkpoint into the scale_cond branch (slim
# warm-start: G+GST weights load, zero-init scale_proj stays fresh so the
# first forward is bit-identical to the e0 model)
[ -f eval_results/ckpt_sc_slim.npz ] || \
  cp eval_results/ckpt_e0_slim.npz eval_results/ckpt_sc_slim.npz

run_leg voc_scale6k 2700 --exp vocoder_quality --steps 6000 \
  --save-dir eval_results/ckpt_sc \
  --override lambda_energy=1.0 --override scale_cond=true \
  --key vocoder_quality_scale6k

run_leg voc6k_f0warm 2700 --exp vocoder_quality --steps 6000 \
  --save-dir eval_results/ckpt_f0 --override lambda_energy=1.0 \
  --arg corpus='"formant"' --key vocoder_quality_6k_f0warm

echo "== tpu_legs_r3a done $(date -u +%H:%M:%S)" >> "$LOG"
