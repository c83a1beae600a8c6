#!/bin/bash
# Round-4 leg chain C (VERDICT r3 next #3 + #4):
#   1-2. formant-class speaker EER with the new anti-overfit levers
#        (best-EER early stopping + beta-mixup + ArcFace margin warmup
#        + 2x train data) on formant and formant_rich. Target <= 5%.
#   3. diarizer_hard retake: NIST-style multi-label DER + prototype
#      cluster merge (speaker-count inflation fix) + overlap regions
#      emitted with BOTH speakers; includes a merge-threshold sweep.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(( $(date +%s) + 18000 ))}
echo "== tpu_legs_r4c start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

probe() { timeout -k 30 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; }
n=0
until probe; do
  n=$((n + 1))
  echo "-- tunnel probe failed ($n) $(date -u +%H:%M:%S)" >> "$LOG"
  [ "$n" -ge 10 ] && { echo "-- tunnel DOWN, aborting chain" >> "$LOG"; exit 1; }
  sleep 120
done

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

run_leg refenc_formant_es 2400 python -m ttsx.eval.parity_aux \
  --exp refenc --key refenc_formant_es \
  --arg corpus='"formant"' --arg steps=12800 --arg utts_train=32 \
  --arg eval_every=200 --arg patience=10 \
  --arg mixup=true --arg margin_warmup=2000

run_leg refenc_formant_rich_es 2400 python -m ttsx.eval.parity_aux \
  --exp refenc --key refenc_formant_rich_es \
  --arg corpus='"formant_rich"' --arg steps=12800 --arg utts_train=32 \
  --arg eval_every=200 --arg patience=10 \
  --arg mixup=true --arg margin_warmup=2000

run_leg diarizer_hard_r4 3000 python -m ttsx.eval.parity_aux \
  --exp diarizer_hard --out eval_results/parity_diar.json \
  --key diarizer_hard

echo "== tpu_legs_r4c done $(date -u +%H:%M:%S)" >> "$LOG"
if [ -x scripts/tpu_legs_r4d.sh ]; then
  DEADLINE_EPOCH=$DEADLINE_EPOCH bash scripts/tpu_legs_r4d.sh
fi
