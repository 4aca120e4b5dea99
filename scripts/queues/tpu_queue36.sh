#!/bin/bash
# Queue 36 (round 2, post-GT-chase): remaining chip work for VERDICT #4/#6,
# trimmed to the time actually left in the round (queue35 was authored for a
# 6 h window that no longer exists; it was never launched).
#   1. CGENN row hardening (VERDICT #4): one >=120-epoch run (fresh seed,
#      checkpoints every 10) with 12-draw batteries at its top-2 checkpoints
#      plus a second-seed battery at the best — giving the row a long-run
#      replica to compare against cgenn_v5e / cgenn_v5e_rerun (60 ep each).
#   2. Fidelity-grade HPO study (VERDICT #6): ponita, mode=param_small
#      (1.8M +-7% width bisection), up to 6 trials at 20x1000 steps with
#      full-length (999-step) self-feed rollouts.  The JSONL store resumes,
#      so however many trials land before the deadline are archived.
#   3. Backstop: CGENN run B (seed 202) if >=45 min remain.
# HARD DEADLINE 17:02 UTC: every step is bounded so the chip is idle before
# the driver's end-of-round bench window.  Steps are idempotent + probe-gated.
set -u
DEADLINE=$(date -d "2026-08-19 17:02 UTC" +%s)
WROOT=/root/repo/runs/r2
mkdir -p "$WROOT"

echo "[queue36] starting at $(date)"

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
gate() {
  until probe_backend; do
    [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue36] deadline hit in gate"; exit 1; }
    sleep 120
  done
}
left_s() { echo $(( DEADLINE - $(date +%s) )); }

cgenn_run() {  # $1=tag $2=seed $3=epochs $4=deadline_hours
  local wd="$WROOT/cgenn_$1"
  mkdir -p "$wd"
  echo "[queue36] cgenn $1 (seed $2, $3 ep) $(date)"
  python /root/repo/scripts/pipeline.py --workdir "$wd" \
    --model cgenn --epochs "$3" --run-name "cgenn_harden_$1" \
    --min-checkpoints 10 --ckpt-interval 10 \
    --draws 12 --draw-seed 281 --second-draw-seed 9272 --top-k 2 \
    --deadline-hours "$4" --poll-s 60 --train-timeout-s 4500 \
    -o "trainer.seed=$2" -o "dataloader.seed=$2" \
    >> "$wd/pipeline_q36.log" 2>&1
  echo "[queue36] cgenn $1 rc=$? $(date); tail: $(tail -1 "$wd/pipeline_q36.log")"
}

gate; cgenn_run A 101 120 1.3

if [ "$(left_s)" -gt 2100 ]; then
  gate
  echo "[queue36] HPO param_small study (ponita), $(left_s)s left $(date)"
  ( cd /root/repo && timeout $(( $(left_s) - 240 )) \
    python -m extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.hpo.hpo \
      --model_type ponita --mode param_small --trials 6 \
      --train_epochs 20 --steps_per_epoch 1000 --self_feed_limit_steps 999 \
      --study_dir "$WROOT/hpo_ponita_small" \
      >> "$WROOT/hpo_q36.log" 2>&1 )
  echo "[queue36] HPO rc=$? $(date); tail: $(tail -2 "$WROOT/hpo_q36.log" | head -1)"
fi

if [ "$(left_s)" -gt 2700 ]; then
  gate; cgenn_run B 202 120 $(awk "BEGIN{printf \"%.2f\", ($(left_s)-300)/3600}")
fi

echo "[queue36] ALL DONE $(date) — chip idle"
