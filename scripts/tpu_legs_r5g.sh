#!/bin/bash
# Round-5 leg chain G — recover the headline from the 18k checkpoint.
# The 18k->22k continuation leg destabilized the GAN (copy-synth EMA MCD
# 54.3 -> 74.9 dB, rms_ratio 0.72 -> 0.53 — recorded inside e2e_sc22k),
# so the best vocoder is the 18k one, recovered from git (commit
# 70075ac's ckpt_sc_slim.npz, meta fixed to cumulative 18000). This leg:
#   1. e2e at the 18k slim with vocoder_steps=0 (slim warm start, train
#      nothing) + zoo refresh — stage ckpts in eval_results/ckpt_e2e
#      make the acoustic/refiner parts restore-only.
#   2. refenc mc2 data-scale retake if time remains (from r5f).
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set an absolute epoch deadline}
echo "== tpu_legs_r5g start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "-- prior chain (pid $WAIT_PID) done $(date -u +%H:%M:%S)" >> "$LOG"
fi

run_leg() {
  local name="$1" budget="$2"; shift 2
  local left=$(( DEADLINE_EPOCH - $(date +%s) ))
  [ "$budget" -gt "$left" ] && budget=$left
  if [ "$budget" -le 120 ]; then
    echo "-- leg $name SKIPPED (past deadline) $(date -u +%H:%M:%S)" >> "$LOG"
    return 0
  fi
  echo "-- leg $name start $(date -u +%H:%M:%S) budget ${budget}s" >> "$LOG"
  timeout -k 30 "$budget" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "-- leg $name rc=$rc end $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

run_leg e2e_sc18k 2400 python -m ttsx.eval.parity_aux \
  --exp e2e --key e2e_sc18k \
  --override lambda_energy=1.0 --override scale_cond=true \
  --arg vocoder_save_dir='"eval_results/ckpt_sc"' \
  --arg vocoder_steps=0 \
  --arg zoo_dir='"eval_results/zoo"' \
  --arg stage_ckpt_dir='"eval_results/ckpt_e2e"'

run_leg refenc_mc2 1800 python -m ttsx.eval.parity_aux \
  --exp refenc --key refenc_formant_mc2 \
  --arg corpus='"formant"' --arg steps=12800 --arg utts_train=128 \
  --arg eval_every=200 --arg mixup=true --arg margin_warmup=2000 \
  --arg eval_crops=6 --arg train_frames=320 --arg patience=8 \
  --arg export_slim='"/tmp/refenc_mc2.npz"'

python - <<'EOF'
import json, shutil
d = json.load(open("eval_results/parity.json"))
new = d.get("refenc_formant_mc2", {}).get("eer", 1.0)
old = d.get("refenc_formant_mc", {}).get("eer", 1.0)
if new < old:
    shutil.copy("/tmp/refenc_mc2.npz", "eval_results/zoo/refenc.npz")
    print(f"promoted mc2 ({new:.4f} < {old:.4f})")
else:
    print(f"kept mc ({old:.4f} <= {new:.4f})")
EOF

echo "== tpu_legs_r5g done $(date -u +%H:%M:%S)" >> "$LOG"
