#!/bin/bash
# Queue 33: GT matched-10M chase, relaunched 2026-08-19 after the machine
# hand-off wiped /tmp (queues 31/32 died with it; none of their candidates
# had trained — the tunnel was down their whole lifetime).  Identical
# candidate ladder and pipeline.py semantics to queue31, with one change:
# workdirs live under the repo's gitignored runs/gt10m/ so partial
# training state (model.ckpt snapshots) survives future hand-offs and
# pipeline.py can resume instead of retraining.
# Stops as soon as any 10M-budget artifact beats the reference 6.9e-3
# (archive_gt10m.py --check scans both /tmp and runs/gt10m locations).
set -u
DEADLINE=$(( $(date +%s) + 172800 ))   # 48 h horizon from launch
WROOT=/root/repo/runs/gt10m

echo "[queue33] starting at $(date)"

chase_met() {
  local check
  check=$(python3 /root/repo/scripts/archive_gt10m.py --check 2>/dev/null)
  echo "[queue33] $check"
  echo "$check" | grep -q '"beats_ref": true'
}

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

# a candidate's pipeline budget must not start ticking while the tunnel is
# down, or a long outage silently skips untrained candidates off the ladder
wait_for_backend_gate() {
  until probe_backend; do
    [ "$(date +%s)" -lt "$DEADLINE" ] || return 1
    sleep 300
  done
}

run_candidate() {  # $1=wd $2=L $3=H $4=heads $5=name $6=epochs $7=seed(''=default)
  local wd="$1" L="$2" H="$3" HD="$4" NAME="$5" EPOCHS="$6" SEED="${7:-}"
  local remaining hours extra=()
  [ -n "$SEED" ] && extra=( -o "trainer.seed=$SEED" -o "dataloader.seed=$SEED" )
  remaining=$(( DEADLINE - $(date +%s) ))
  [ "$remaining" -lt 3600 ] && return 1
  hours=$(( remaining / 3600 )); [ "$hours" -gt 10 ] && hours=10
  echo "[queue33] candidate $NAME (L$L h$H heads$HD ${EPOCHS}ep seed=${SEED:-def}) budget ${hours}h $(date)"
  mkdir -p "$wd"
  python /root/repo/scripts/pipeline.py --workdir "$wd" \
    --model graph_transformer --epochs "$EPOCHS" --run-name "$NAME" \
    --min-checkpoints 60 --ckpt-interval 10 \
    --draws 12 --draw-seed 281 --second-draw-seed 9272 --top-k 3 \
    --deadline-hours "$hours" --poll-s 300 \
    -o "model.num_layers=$L" -o "model.hidden_features=$H" \
    -o "model.num_heads=$HD" "${extra[@]}" \
    >> "$wd/pipeline_q33.log" 2>&1
  echo "[queue33] candidate $NAME rc=$? $(date); best line: $(tail -1 "$wd/pipeline_q33.log")"
}

CANDIDATES=(
  "$WROOT/gt_10m_deep       8 248 8 gt10m_deep       900"
  "$WROOT/gt_10m_deep6      6 304 8 gt10m_deep6      900"
  "$WROOT/gt_10m_deep_s7    8 248 8 gt10m_deep_s7    700 7"
  "$WROOT/gt_10m_deep6_s7   6 304 8 gt10m_deep6_s7   700 7"
  "$WROOT/gt_10m_deep_s11   8 248 8 gt10m_deep_s11   700 11"
  "$WROOT/gt_10m_deep6_s11  6 304 8 gt10m_deep6_s11  700 11"
  "$WROOT/gt_10m_deep10    10 208 8 gt10m_deep10     900"
  "$WROOT/gt_10m_h4         8 248 4 gt10m_h4         700"
  "$WROOT/gt_10m_deep10_s7 10 208 8 gt10m_deep10_s7  700 7"
  "$WROOT/gt_10m_deep10_s11 10 208 8 gt10m_deep10_s11 700 11"
)

for cand in "${CANDIDATES[@]}"; do
  if chase_met; then echo "[queue33] chase MET — DONE $(date)"; exit 0; fi
  [ "$(date +%s)" -lt "$DEADLINE" ] || break
  if ! wait_for_backend_gate; then
    echo "[queue33] horizon exhausted waiting for the backend $(date)"
    break
  fi
  # shellcheck disable=SC2086 — intentional word splitting of the tuple
  run_candidate $cand
done

if chase_met; then
  echo "[queue33] chase MET — DONE $(date)"
else
  echo "[queue33] horizon exhausted without beating 6.9e-3 $(date)"
fi
echo "[queue33] ALL DONE $(date) — chip idle"
