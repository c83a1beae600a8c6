#!/bin/bash
# Round-5 leg chain B — after r5a (vocoder curve) completes:
#   1. refenc base-formant retake with the round-5 levers: multi-crop
#      eval averaging (eval_crops=4) + train-crop jitter (train_frames=
#      256) on top of the r4 recipe (early stop, mixup, margin warmup).
#      Exports the best params to the zoo (VERDICT r4 #4 + #5).
#   2. GE2E A/B on the same corpus (VERDICT r4 #4 lever list).
#   3. prosody trained-parity retake + zoo export.
#   4. diarizer_hard retake at production settings with the
#      boundary-anchored screened emission (VERDICT r4 #6) + slice
#      encoder zoo export (VERDICT r4 #5).
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set an absolute epoch deadline}
echo "== tpu_legs_r5b start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

# wait for any prior leg-runner to release the TPU (single-flight rule)
if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "-- prior chain (pid $WAIT_PID) done $(date -u +%H:%M:%S)" >> "$LOG"
fi

probe_compute() {
  timeout -k 30 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).sum()) > 0" >/dev/null 2>&1
}
PROBE_TRIES=${PROBE_TRIES:-20}
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

run_leg refenc_mc 1800 python -m ttsx.eval.parity_aux \
  --exp refenc --key refenc_formant_mc \
  --arg corpus='"formant"' --arg steps=12800 --arg utts_train=64 \
  --arg eval_every=200 --arg mixup=true --arg margin_warmup=2000 \
  --arg eval_crops=4 --arg train_frames=256 \
  --arg export_slim='"eval_results/zoo/refenc.npz"'

run_leg refenc_ge2e 1800 python -m ttsx.eval.parity_aux \
  --exp refenc --key refenc_formant_ge2e \
  --arg corpus='"formant"' --arg steps=12800 --arg utts_train=64 \
  --arg eval_every=200 --arg margin_warmup=0 --arg loss='"ge2e"' \
  --arg eval_crops=4 --arg train_frames=256

run_leg prosody_zoo 1500 python -m ttsx.eval.parity_aux \
  --exp prosody --key prosody \
  --arg export_slim='"eval_results/zoo/prosody.npz"'

run_leg diar_hard 1800 python -m ttsx.eval.parity_aux \
  --exp diarizer_hard --out eval_results/parity_diar.json \
  --arg train_steps=1600 \
  --arg export_slim='"eval_results/zoo/diar_encoder.npz"'

# record aux-stage steps in zoo.json so the fresh-clone story is
# self-describing (VERDICT r4 weak #3 staleness class of bug)
python - <<'EOF'
import json, pathlib
p = pathlib.Path("eval_results/zoo/zoo.json")
z = json.loads(p.read_text()) if p.exists() else {}
steps = z.setdefault("steps", {})
for name, npz, key in (("refenc", "refenc.npz", "steps"),
                       ("prosody", "prosody.npz", "steps"),
                       ("diar_encoder", "diar_encoder.npz", "steps")):
    f = pathlib.Path("eval_results/zoo") / npz
    if f.exists():
        from ttsx.train.slim_export import load_slim_meta
        m = load_slim_meta(str(f))
        if key in m:
            steps[name] = int(m[key])
p.write_text(json.dumps(z, indent=1))
print("zoo.json:", z)
EOF

echo "== tpu_legs_r5b done $(date -u +%H:%M:%S)" >> "$LOG"
