#!/bin/bash
# Queue 39 (authored round 2): matched-10M CGENN row — the last cell of the
# reference's two-budget table (figures/combined_pvalues_10M.csv: cgenn best
# 5.0e-100 @ ckpt 10) without a budget-matched run on our side once queue37
# (eqv2-10M) lands.
#
# Shapes from hpo.adjust_width_to_target("cgenn", ..., 10M +-7%):
#   L6 hidden 176 -> 9,814,466 params   (primary — depth won the GT chase)
#   L4 hidden 224 -> 10,564,738 params  (backstop)
# (L8 bisects to h160 = 10.83M, outside +-7% — excluded.)
#
# Protocol matches cgenn_harden_A (docs/results/): 120 epochs, checkpoint
# every 10, 12-draw batteries at top-2 checkpoints + second-seed battery.
# The hardening run showed CGENN's early epochs oscillate and the long tail
# climbs out (~ckpt 110+), so 120 epochs is the floor, not a cap.
#
# Usage: [Q39_WAIT_PID=<pid>] [Q39_HORIZON_H=N] bash tpu_queue39.sh
set -u
HORIZON_H=${Q39_HORIZON_H:-8}
DEADLINE=$(( $(date +%s) + HORIZON_H * 3600 ))
WROOT=/root/repo/runs/r2
mkdir -p "$WROOT"

echo "[queue39] starting at $(date)"

if [ -n "${Q39_WAIT_PID:-}" ]; then
  echo "[queue39] waiting on pid $Q39_WAIT_PID"
  while [ -d "/proc/$Q39_WAIT_PID" ]; do
    [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue39] deadline hit while waiting"; exit 1; }
    sleep 60
  done
  echo "[queue39] pid $Q39_WAIT_PID gone at $(date)"
fi

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
gate() {
  until probe_backend; do
    [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue39] deadline hit in gate"; exit 1; }
    sleep 120
  done
}
left_s() { echo $(( DEADLINE - $(date +%s) )); }

SIDECAR=/root/repo/scripts/queues/snapshot_sidecar.sh

cgenn_run() {  # $1=tag $2=layers $3=hidden $4=deadline_hours
  local wd="$WROOT/cgenn_10m_$1"
  mkdir -p "$wd"
  echo "[queue39] cgenn_10m $1 (L$2 h$3, 120 ep) $(date)"
  # hand-off safety: resume from any committed partial, mirror progress back
  bash "$SIDECAR" seed "$wd" cgenn "cgenn_10m_$1"
  rm -f "$wd/.sidecar_stop"
  bash "$SIDECAR" watch "$wd" "cgenn_10m_$1" 600 "$DEADLINE" \
    >> "$wd/sidecar.log" 2>&1 &
  local sidecar_pid=$!
  python /root/repo/scripts/pipeline.py --workdir "$wd" \
    --model cgenn --epochs 120 --run-name "cgenn_10m_$1" \
    --min-checkpoints 10 --ckpt-interval 10 \
    --draws 12 --draw-seed 281 --second-draw-seed 9272 --top-k 2 \
    --deadline-hours "$4" --poll-s 120 --train-timeout-s 10800 \
    -o "model.num_layers=$2" \
    -o "model.hidden_features=$3" \
    -o "model.remat=true" \
    >> "$wd/pipeline_q39.log" 2>&1
  echo "[queue39] cgenn_10m $1 rc=$? $(date); tail: $(tail -1 "$wd/pipeline_q39.log")"
  touch "$wd/.sidecar_stop"; wait "$sidecar_pid" 2>/dev/null
}

gate; cgenn_run L6h176 6 176 "${Q39_PRIMARY_H:-4}"
if [ "$(left_s)" -gt 12600 ]; then
  gate; cgenn_run L4h224 4 224 3
fi

echo "[queue39] ALL DONE $(date) — chip idle"
