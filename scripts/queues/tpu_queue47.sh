#!/bin/bash
# Queue 47 (round 5): chained on queue46's pid — picks up whatever its
# 16:56Z deadline cut (expected: step 4 winner promotion and/or step 5
# N=100 continuation), with a later deadline sized to the round end.
# Idempotent: same workdirs; pipeline.py skips completed stages.
#
# Usage: bash tpu_queue47.sh <pid-to-wait-for> [deadline-epoch-seconds]
set -u
PIPE_PID=${1:?usage: tpu_queue47.sh <pid-to-wait-for> [deadline-epoch]}
DEADLINE=${2:-$(( $(date +%s) + 6 * 3600 ))}
WROOT=/root/repo/runs/r5
SIDECAR=/root/repo/scripts/queues/snapshot_sidecar.sh
PIPE=/root/repo/scripts/pipeline.py
mkdir -p "$WROOT"
left() { echo $(( DEADLINE - $(date +%s) )); }

echo "[queue47] starting $(date); waiting on pid $PIPE_PID"
while [ -d "/proc/$PIPE_PID" ]; do
  [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue47] deadline while waiting"; exit 1; }
  sleep 60
done
echo "[queue47] pid $PIPE_PID gone $(date)"

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
until probe_backend; do
  [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue47] deadline in gate"; exit 1; }
  sleep 60
done

step() {  # same step runner as queue46
  local TAG=$1 MODEL=$2 EPOCHS=$3 CAP=$4 DRAWS=$5 TOPK=$6; shift 6
  local L B WD
  L=$(left)
  if [ "$L" -lt 900 ]; then
    echo "[queue47] $TAG skipped (only ${L}s left) $(date)"; return 1
  fi
  B=$(( L - 120 )); [ "$B" -gt "$CAP" ] && B=$CAP
  WD="$WROOT/$TAG"; mkdir -p "$WD"
  echo "[queue47] $TAG: ${EPOCHS} ep, budget ${B}s $(date)"
  rm -f "$WD/.sidecar_stop"
  bash "$SIDECAR" watch "$WD" "$TAG" 900 "$DEADLINE" >> "$WD/sidecar.log" 2>&1 &
  local SPID=$!
  local OV=()
  for o in "$@"; do OV+=(-o "$o"); done
  python "$PIPE" --workdir "$WD" --model "$MODEL" --epochs "$EPOCHS" \
    --run-name "$TAG" --ckpt-interval 10 \
    --draws "$DRAWS" --draw-seed 281 --second-draw-seed 9272 --top-k "$TOPK" \
    --deadline-hours "$(python -c "print($B/3600)")" --poll-s 120 \
    --train-timeout-s $(( B - 120 )) \
    "${OV[@]}" >> "$WD/pipeline.log" 2>&1
  echo "[queue47] $TAG pipeline rc=$? $(date)"
  touch "$WD/.sidecar_stop"; wait "$SPID" 2>/dev/null
}

step egnn_hpo10m_winner egnn_mc 150 4200 12 2 \
  "model.num_layers=6" "model.hidden_node_dim=688" \
  "trainer.learning_rate=0.08207853270831023"

WD="$WROOT/egnn_n100_cont"
if [ ! -d "$WD/runs" ] && [ "$(left)" -gt 900 ]; then
  d="$WD/runs/egnn_mc/$(date -u +%Y-%m-%d_%H-%M-%S)__seeded_from_fidelity_row"
  mkdir -p "$d"
  cp /root/repo/docs/results/fidelity_n100/egnn_n100_ckpt_30_model.ckpt "$d/model.ckpt"
fi
step egnn_n100_cont egnn_mc 150 7200 6 1 \
  "dataloader.batch_size=16" \
  "dataloader.gravity_dataset.num_atoms=100" \
  "dataloader.gravity_dataset.sim_length=2500" \
  "trainer.self_feed_limit_steps=249"

echo "[queue47] ALL DONE $(date) — chip idle"
