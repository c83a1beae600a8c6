#!/bin/bash
# Round-3 session-3 chain, part 2 (replaces the r3e tail): same legs, but
# the e2e refresh also EXPORTS the trained chain as the git-tracked
# pretrained zoo (eval_results/zoo/) that ttsx.zoo.load_pipeline promises
# — the r3e chain forgot zoo_dir and the trained acoustic/refiner states
# would have died with the process. Tail adds a bench.py validation run
# (the MFU/dispatch-split fields have never run on real TPU).
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 4200 ))}
echo "== tpu_legs_r3f start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

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

run_leg e2e_scale_gain_v2 2700 python -m ttsx.eval.parity_aux --exp e2e \
  --arg vocoder_save_dir='"eval_results/ckpt_sg"' \
  --arg vocoder_steps=6000 \
  --arg vocoder_overrides='{"lambda_energy": 1.0, "scale_cond": true, "scale_gain": true}' \
  --arg zoo_dir='"eval_results/zoo"' \
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

run_leg bench 700 python bench.py

echo "== tpu_legs_r3f done $(date -u +%H:%M:%S)" >> "$LOG"
