#!/bin/bash
# Queue 35 (round 2): post-GT-chase chip schedule.
#   1. CGENN row hardening (VERDICT #4): two independent >=120-epoch runs
#      (fresh seeds, per-checkpoint params) via pipeline.py, each with
#      12-draw batteries at its top-2 checkpoints — so the row's best-draw
#      stops swinging orders of magnitude between replicas.
#   2. Fidelity-grade HPO study (VERDICT #6): ponita, mode=param_small
#      (1.8M +-7% width bisection), 6 trials at 20x1000 steps with
#      full-length (999-step) self-feed rollouts — enough budget that the
#      objective is a real log-p, not the 1e-300 floor.
# Each step is idempotent (pipeline.py resumes; the HPO store resumes) and
# probe-gated.  Launch AFTER queue33 has released the chip.
set -u
DEADLINE=$(( $(date +%s) + 21600 ))   # 6 h horizon
WROOT=/root/repo/runs/r2
mkdir -p "$WROOT"

echo "[queue35] starting at $(date)"

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
gate() {
  until probe_backend; do
    [ "$(date +%s)" -lt "$DEADLINE" ] || exit 1
    sleep 120
  done
}

cgenn_run() {  # $1=tag $2=seed
  local wd="$WROOT/cgenn_$1"
  mkdir -p "$wd"
  echo "[queue35] cgenn $1 (seed $2) $(date)"
  python /root/repo/scripts/pipeline.py --workdir "$wd" \
    --model cgenn --epochs 120 --run-name "cgenn_harden_$1" \
    --min-checkpoints 10 --ckpt-interval 10 \
    --draws 12 --draw-seed 281 --top-k 2 \
    --deadline-hours 2 --poll-s 120 --train-timeout-s 7200 \
    -o "trainer.seed=$2" -o "dataloader.seed=$2" \
    >> "$wd/pipeline_q35.log" 2>&1
  echo "[queue35] cgenn $1 rc=$? $(date); tail: $(tail -1 "$wd/pipeline_q35.log")"
}

gate; cgenn_run A 101
[ "$(date +%s)" -lt "$DEADLINE" ] && { gate; cgenn_run B 202; }

if [ "$(date +%s)" -lt "$DEADLINE" ]; then
  gate
  echo "[queue35] HPO param_small study (ponita) $(date)"
  cd /root/repo && python -m extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.hpo.hpo \
    --model_type ponita --mode param_small --trials 6 \
    --train_epochs 20 --steps_per_epoch 1000 --self_feed_limit_steps 999 \
    --study_dir "$WROOT/hpo_ponita_small" \
    >> "$WROOT/hpo_q35.log" 2>&1
  echo "[queue35] HPO rc=$? $(date); tail: $(tail -2 "$WROOT/hpo_q35.log" | head -1)"
fi

echo "[queue35] ALL DONE $(date) — chip idle"
