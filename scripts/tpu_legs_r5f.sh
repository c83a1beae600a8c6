#!/bin/bash
# Round-5 leg chain F — refenc base-formant: the multi-crop retake
# measured 5.56 % (from 7.8 %), curve flat ~5.6 % after step 4k =
# data-bound. Double the train set + longer source utterances + more
# eval crops. Exports to the zoo only if it beats the mc leg's 5.56 %
# (the zoo export from refenc_mc stays otherwise).
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set an absolute epoch deadline}
echo "== tpu_legs_r5f start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

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
  echo "-- leg $name rc=$? end $(date -u +%H:%M:%S)" >> "$LOG"
}

run_leg refenc_mc2 1800 python -m ttsx.eval.parity_aux \
  --exp refenc --key refenc_formant_mc2 \
  --arg corpus='"formant"' --arg steps=12800 --arg utts_train=128 \
  --arg eval_every=200 --arg mixup=true --arg margin_warmup=2000 \
  --arg eval_crops=6 --arg train_frames=320 --arg patience=8 \
  --arg export_slim='"/tmp/refenc_mc2.npz"'

# promote only on improvement
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

echo "== tpu_legs_r5f done $(date -u +%H:%M:%S)" >> "$LOG"
