#!/bin/bash
# Queue 37 (authored round 2, to LAUNCH at the next free chip window —
# e.g. round-3 start): matched-10M EquiformerV2 row (round-1 VERDICT #7).
#
# The scoreboard's EqV2 entry (0.8588 battery best, equiformer_v2_s7_v5e)
# beats both reference numbers with a 1.75M-param model; this completes the
# two-budget table the reference publishes (figures/combined_pvalues_10M.csv:
# best 0.082 @ ckpt 130).  Shape from our HPO param-budget bisection over the
# reference's eqv2 space (hpo/hpo.py adjust_width_to_target, 10M +-7%):
#   L8 heads8 sphere/attn/ffn channels 128  -> 9,689,010 params  (primary)
#   L10 heads8 channels 112                 -> 9,582,754 params  (backstop)
# (L6 bisects to c160 = 10.89M, outside +-7% — excluded.)
#
# Done criterion: a 10M-class eqv2 row with a 12-draw battery best >= 0.082.
# Each step is idempotent (pipeline.py resumes) and probe-gated.
#
# model.remat=true is REQUIRED at this scale: without it the 8-layer scan
# keeps every block's per-edge intermediates for backprop and the train step
# OOMs HBM at compile (15.93G vs 15.75G on v5e; measured 2026-08-19).
set -u
HORIZON_H=${Q37_HORIZON_H:-12}
DEADLINE=$(( $(date +%s) + HORIZON_H * 3600 ))
WROOT=/root/repo/runs/r2
mkdir -p "$WROOT"

echo "[queue37] starting at $(date)"

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
gate() {
  until probe_backend; do
    [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue37] deadline hit in gate"; exit 1; }
    sleep 120
  done
}
left_s() { echo $(( DEADLINE - $(date +%s) )); }

SIDECAR=/root/repo/scripts/queues/snapshot_sidecar.sh

eqv2_run() {  # $1=tag $2=layers $3=channels $4=epochs $5=deadline_hours
  local wd="$WROOT/eqv2_10m_$1"
  mkdir -p "$wd"
  echo "[queue37] eqv2_10m $1 (L$2 c$3, $4 ep) $(date)"
  # hand-off safety: resume from any committed partial, mirror progress back
  bash "$SIDECAR" seed "$wd" equiformer_v2 "eqv2_10m_$1"
  rm -f "$wd/.sidecar_stop"
  bash "$SIDECAR" watch "$wd" "eqv2_10m_$1" 600 "$DEADLINE" \
    >> "$wd/sidecar.log" 2>&1 &
  local sidecar_pid=$!
  python /root/repo/scripts/pipeline.py --workdir "$wd" \
    --model equiformer_v2 --epochs "$4" --run-name "eqv2_10m_$1" \
    --min-checkpoints 10 --ckpt-interval 10 \
    --draws 12 --draw-seed 281 --second-draw-seed 9272 --top-k 2 \
    --deadline-hours "$5" --poll-s 120 --train-timeout-s 14400 \
    -o "model.num_layers=$2" \
    -o "model.sphere_channels=$3" \
    -o "model.attn_hidden_channels=$3" \
    -o "model.ffn_hidden_channels=$3" \
    -o "model.num_heads=8" \
    -o "model.remat=true" \
    >> "$wd/pipeline_q37.log" 2>&1
  echo "[queue37] eqv2_10m $1 rc=$? $(date); tail: $(tail -1 "$wd/pipeline_q37.log")"
  touch "$wd/.sidecar_stop"; wait "$sidecar_pid" 2>/dev/null
}

# primary: the deep shape that won the GT-10M chase pattern (depth over width)
gate; eqv2_run L8c128 8 128 200 "${Q37_PRIMARY_H:-5}"
# backstop if time remains: the deepest budget shape
if [ "$(left_s)" -gt 14400 ]; then
  gate; eqv2_run L10c112 10 112 200 4
fi

echo "[queue37] ALL DONE $(date) — chip idle"
