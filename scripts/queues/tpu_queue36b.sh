#!/bin/bash
# Queue 36b (round 2): corrected HPO step, replacing queue36's tail.
#
# queue36's HPO step as committed would have run ponita at 20 epochs/trial —
# but the archived ponita series (docs/results/ponita_v5e_80ep) floors at
# 1e-300 through epoch 40 (first real p at ckpt 50), so every trial's
# objective would sit on the -690.78 floor: exactly the round-1 failure
# VERDICT #6 calls out.  egnn_mc leaves the floor by epoch ~40
# (docs/results/egnn_mc_v5e: ckpt 40 -> 3.3e-19, log -42.6 > -50), so the
# fidelity-grade study is egnn_mc / param_small (1.8M +-7%) / 60 epochs per
# trial.  The JSONL store resumes, so trials cut off by the round's bench
# window are simply absent and the study can be extended next round.
#
# Waits for the in-flight cgenn_A pipeline (passed as $1) to release the
# chip first.  HARD STOP 16:58 UTC so the driver's end-of-round bench finds
# an idle chip.
set -u
PIPE_PID=${1:?usage: tpu_queue36b.sh <pid-to-wait-for>}
DEADLINE=$(date -d "2026-08-19 16:58 UTC" +%s)
WROOT=/root/repo/runs/r2
mkdir -p "$WROOT"

echo "[queue36b] starting at $(date); waiting on pid $PIPE_PID"
while [ -d "/proc/$PIPE_PID" ]; do
  [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue36b] deadline while waiting"; exit 1; }
  sleep 30
done
echo "[queue36b] pid $PIPE_PID gone at $(date)"

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
until probe_backend; do
  [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue36b] deadline in gate"; exit 1; }
  sleep 60
done

LEFT=$(( DEADLINE - $(date +%s) ))
if [ "$LEFT" -lt 600 ]; then
  echo "[queue36b] only ${LEFT}s left — not worth starting a trial"; exit 0
fi
echo "[queue36b] HPO param_small study (egnn_mc, 60 ep/trial), ${LEFT}s budget $(date)"
( cd /root/repo && timeout $(( LEFT - 120 )) \
  python -m extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.hpo.hpo \
    --model_type egnn_mc --mode param_small --trials 6 \
    --train_epochs 60 --steps_per_epoch 1000 --self_feed_limit_steps 999 \
    --study_dir "$WROOT/hpo_egnn_small" \
    >> "$WROOT/hpo_q36b.log" 2>&1 )
echo "[queue36b] HPO rc=$? $(date); log tail:"
tail -3 "$WROOT/hpo_q36b.log"
echo "[queue36b] ALL DONE $(date) — chip idle"
