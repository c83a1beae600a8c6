#!/bin/bash
# Round-5 leg chain A — the round-4 session-3 queue, in order:
#   1. vocoder scale_cond 12k -> 18k effective (slim-only warm start:
#      the Orbax tree dies with the VM at round boundaries, so G+GST
#      come from eval_results/ckpt_sc_slim.npz [meta steps=12000] and
#      the counter restarts at 0; 6000 fresh steps = 18k effective).
#   2. e2e retake + zoo refresh on the updated checkpoint
#      (vocoder_steps=6000 matches the tree leg 1 leaves behind, so the
#      e2e leg restores it and trains 0 further steps).
#   3. 18k -> 24k continuation if the window allows (cumulative
#      --steps 12000 against the counter at 6000).
# Probes the tunnel DATA plane (compile+exec+transfer), not device
# enumeration: in round-4 session 3 `jax.devices()` answered in seconds
# while a 256x256 matmul took 74 s, and two legs hung in corpus-prep
# transfers (see CLAUDE.md round-4 status).
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set an absolute epoch deadline}
echo "== tpu_legs_r5a start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

probe_compute() {
  timeout -k 30 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).sum()) > 0" >/dev/null 2>&1
}
PROBE_TRIES=${PROBE_TRIES:-8}
n=0
until probe_compute; do
  n=$((n + 1))
  echo "-- compute probe failed ($n) $(date -u +%H:%M:%S)" >> "$LOG"
  [ "$n" -ge "$PROBE_TRIES" ] && { echo "-- tunnel compute DOWN, aborting" >> "$LOG"; exit 1; }
  sleep 180
done
echo "-- compute probe OK $(date -u +%H:%M:%S)" >> "$LOG"

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

# Counter step of the Orbax tree leg 1 leaves behind (0 if absent).
# Guards the e2e leg: if leg 1 was killed before its 6000-step target,
# pass the ACTUAL counter so e2e restores-and-trains-0 rather than
# silently training the remainder inside its own budget, and label the
# key with the true effective steps (slim warm start = 12k + counter).
ckpt_step() {
  python -c "
import json, pathlib
p = pathlib.Path('eval_results/ckpt_sc/vocoder_quality/meta.json')
print(json.loads(p.read_text())['step'] if p.exists() else 0)" 2>/dev/null || echo 0
}

run_leg voc_sc18k 2850 python -m ttsx.eval.parity_aux \
  --exp vocoder_quality --steps 6000 \
  --save-dir eval_results/ckpt_sc \
  --override lambda_energy=1.0 --override scale_cond=true \
  --key vocoder_quality_sc18k

STEP=$(ckpt_step)
if [ "$STEP" -gt 0 ]; then
  EFF=$(( (12000 + STEP) / 1000 ))
  run_leg e2e_sc${EFF}k 1800 python -m ttsx.eval.parity_aux \
    --exp e2e --key e2e_sc${EFF}k \
    --override lambda_energy=1.0 --override scale_cond=true \
    --arg vocoder_save_dir='"eval_results/ckpt_sc"' \
    --arg vocoder_steps=$STEP \
    --arg zoo_dir='"eval_results/zoo"'
else
  echo "-- e2e leg SKIPPED (no vocoder checkpoint counter)" >> "$LOG"
fi

run_leg voc_sc24k 2850 python -m ttsx.eval.parity_aux \
  --exp vocoder_quality --steps 12000 \
  --save-dir eval_results/ckpt_sc \
  --override lambda_energy=1.0 --override scale_cond=true \
  --key vocoder_quality_sc24k

# Refresh zoo + e2e headline from the best (24k-effective) checkpoint.
STEP=$(ckpt_step)
if [ "$STEP" -gt 6000 ]; then
  EFF=$(( (12000 + STEP) / 1000 ))
  run_leg e2e_sc${EFF}k 1800 python -m ttsx.eval.parity_aux \
    --exp e2e --key e2e_sc${EFF}k \
    --override lambda_energy=1.0 --override scale_cond=true \
    --arg vocoder_save_dir='"eval_results/ckpt_sc"' \
    --arg vocoder_steps=$STEP \
    --arg zoo_dir='"eval_results/zoo"'
fi

echo "== tpu_legs_r5a done $(date -u +%H:%M:%S)" >> "$LOG"
