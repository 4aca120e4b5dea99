#!/bin/bash
# Queue 48 (round 5): relaunch of the queue46 ladder after the 11:17Z
# machine hand-off killed queue46 mid-step-1 (SEGNN-10M at epoch 100/140;
# the sidecar archived that state into docs/results/segnn10m_r5_partial/).
# Every step is idempotent and resume-aware: step 1 seeds from the
# committed partial and trains the remaining 40 epochs, then the ladder
# proceeds in round-4 VERDICT priority order.  Same step runner, caps and
# sidecar protocol as queue46.
#
# Usage: bash tpu_queue48.sh [deadline-epoch-seconds]
set -u
DEADLINE=${1:-$(( $(date +%s) + 25200 ))}
WROOT=/root/repo/runs/r5
SIDECAR=/root/repo/scripts/queues/snapshot_sidecar.sh
PIPE=/root/repo/scripts/pipeline.py
mkdir -p "$WROOT"
left() { echo $(( DEADLINE - $(date +%s) )); }

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
until probe_backend; do
  [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue48] deadline in gate"; exit 1; }
  sleep 60
done

# tag model epochs cap_s draws topk overrides...
step() {
  local TAG=$1 MODEL=$2 EPOCHS=$3 CAP=$4 DRAWS=$5 TOPK=$6; shift 6
  local L B WD
  L=$(left)
  if [ "$L" -lt 1200 ]; then
    echo "[queue48] $TAG skipped (only ${L}s left) $(date)"; return 1
  fi
  B=$(( L - 300 )); [ "$B" -gt "$CAP" ] && B=$CAP
  WD="$WROOT/$TAG"; mkdir -p "$WD"
  echo "[queue48] $TAG: ${EPOCHS} ep, budget ${B}s $(date)"
  bash "$SIDECAR" seed "$WD" "$MODEL" "$TAG" >> "$WD/sidecar.log" 2>&1
  rm -f "$WD/.sidecar_stop"
  bash "$SIDECAR" watch "$WD" "$TAG" 600 "$DEADLINE" >> "$WD/sidecar.log" 2>&1 &
  local SPID=$!
  local OV=()
  for o in "$@"; do OV+=(-o "$o"); done
  python "$PIPE" --workdir "$WD" --model "$MODEL" --epochs "$EPOCHS" \
    --run-name "$TAG" --ckpt-interval 10 \
    --draws "$DRAWS" --draw-seed 281 --second-draw-seed 9272 --top-k "$TOPK" \
    --deadline-hours "$(python -c "print($B/3600)")" --poll-s 120 \
    --train-timeout-s $(( B - 240 )) \
    "${OV[@]}" >> "$WD/pipeline.log" 2>&1
  echo "[queue48] $TAG pipeline rc=$? $(date)"
  touch "$WD/.sidecar_stop"; wait "$SPID" 2>/dev/null
}

# 1. SEGNN-10M: resume ep 100 -> 140 + 12-draw batteries top-2 + 2nd seed
step segnn10m_r5 segnn 140 7200 12 2 \
  "model.num_layers=6" "model.hidden_features=448"

# 2. GT-10M retrain (original peaked at ckpt 370 of 900)
step gt10m_r5 graph_transformer 380 16200 12 2 \
  "model.num_layers=8" "model.hidden_features=248" "model.num_heads=8"

# 3. PONITA-10M retrain (original peaked at 210)
step ponita10m_r5 ponita 220 12600 12 2 \
  "model.num_layers=5" "model.hidden_features=480"

# 4. egnn_mc param_medium winner promotion (study winner L6 w688)
step egnn_hpo10m_winner egnn_mc 200 7200 12 2 \
  "model.num_layers=6" "model.hidden_node_dim=688" \
  "trainer.learning_rate=0.08207853270831023"

# 5. N=100 continuation from the committed fidelity ckpt-30 snapshot
WD="$WROOT/egnn_n100_cont"
if [ ! -d "$WD/runs" ] && [ "$(left)" -gt 1200 ]; then
  d="$WD/runs/egnn_mc/$(date -u +%Y-%m-%d_%H-%M-%S)__seeded_from_fidelity_row"
  mkdir -p "$d"
  cp /root/repo/docs/results/fidelity_n100/egnn_n100_ckpt_30_model.ckpt "$d/model.ckpt"
fi
step egnn_n100_cont egnn_mc 150 10800 6 1 \
  "dataloader.batch_size=16" \
  "dataloader.gravity_dataset.num_atoms=100" \
  "dataloader.gravity_dataset.sim_length=2500" \
  "trainer.self_feed_limit_steps=249"

echo "[queue48] ALL DONE $(date) — chip idle"
