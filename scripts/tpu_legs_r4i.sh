#!/bin/bash
# Round-4 leg chain I (session 3): vocoder scale_cond continuation to 18k
# effective. The Orbax tree died with the VM at the session boundary, so
# this warm-starts G+GST from the tracked eval_results/ckpt_sc_slim.npz
# (meta steps=12000) and trains 6000 fresh steps; save_every=2000 keeps
# progress if the deadline kills the leg mid-run.
set -u
cd /root/repo
LOG=/tmp/tpu_jobs.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set an absolute epoch deadline}
echo "== tpu_legs_r4i start $(date -u +%H:%M:%S) deadline $(date -u -d @$DEADLINE_EPOCH +%H:%M:%S)" >> "$LOG"

probe() { timeout -k 30 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; }
n=0
until probe; do
  n=$((n + 1))
  echo "-- tunnel probe failed ($n) $(date -u +%H:%M:%S)" >> "$LOG"
  [ "$n" -ge 5 ] && { echo "-- tunnel DOWN, aborting chain" >> "$LOG"; exit 1; }
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

# slim-only warm start => step counter restarts at 0; 6000 here is
# 18k effective cumulative training on these params.
run_leg voc_sc18k 2700 python -m ttsx.eval.parity_aux \
  --exp vocoder_quality --steps 6000 \
  --save-dir eval_results/ckpt_sc \
  --override lambda_energy=1.0 --override scale_cond=true \
  --key vocoder_quality_sc18k

echo "== tpu_legs_r4i done $(date -u +%H:%M:%S)" >> "$LOG"
