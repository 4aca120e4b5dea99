#!/bin/bash
# Queue 38 (authored round 2): train the param_small HPO WINNER to a full
# scoreboard row — the end-to-end demonstration that the HPO subsystem's
# objective ranks real fidelity (round-1 VERDICT #6's follow-through).
#
# Winner (docs/results/hpo_param_small_egnn/, trial 1, objective -48.0):
#   egnn_mc L6 hidden 240 (bisected to 1,872,828 params), lr 0.0821
#   trainer: learning_rate_factor 1.0, warmup 2048 (hpo.py trial settings)
#
# Run it to 200 epochs (checkpoint every 10) + 12-draw batteries at the
# top-2 checkpoints + an independent second-seed battery, same protocol as
# the other scoreboard rows.  egnn_mc trains ~12k steps/min on one v5e, so
# the whole step is well under an hour.
#
# Usage: [Q38_WAIT_PID=<pid>] [Q38_HORIZON_H=N] bash tpu_queue38.sh
# If Q38_WAIT_PID is set, wait for that pid (e.g. queue37) to exit first.
set -u
HORIZON_H=${Q38_HORIZON_H:-4}
DEADLINE=$(( $(date +%s) + HORIZON_H * 3600 ))
WROOT=/root/repo/runs/r2
mkdir -p "$WROOT"

echo "[queue38] starting at $(date)"

if [ -n "${Q38_WAIT_PID:-}" ]; then
  echo "[queue38] waiting on pid $Q38_WAIT_PID"
  while [ -d "/proc/$Q38_WAIT_PID" ]; do
    [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue38] deadline hit while waiting"; exit 1; }
    sleep 60
  done
  echo "[queue38] pid $Q38_WAIT_PID gone at $(date)"
fi

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
until probe_backend; do
  [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue38] deadline hit in gate"; exit 1; }
  sleep 120
done

left_h=$(( (DEADLINE - $(date +%s)) / 3600 ))
[ "$left_h" -ge 1 ] || left_h=1
wd="$WROOT/egnn_hpo_winner"
mkdir -p "$wd"

# runs/ is gitignored and wiped on machine hand-offs: seed the workdir from
# the committed snapshot and mirror progress back (snapshot_sidecar.sh).
SIDECAR=/root/repo/scripts/queues/snapshot_sidecar.sh
bash "$SIDECAR" seed "$wd" egnn_mc egnn_hpo_winner
rm -f "$wd/.sidecar_stop"
bash "$SIDECAR" watch "$wd" egnn_hpo_winner 600 "$DEADLINE" \
  >> "$wd/sidecar.log" 2>&1 &
SIDECAR_PID=$!
echo "[queue38] egnn_mc HPO-winner row (L6 h240, lr 0.0821, 200 ep) $(date)"
python /root/repo/scripts/pipeline.py --workdir "$wd" \
  --model egnn_mc --epochs 200 --run-name egnn_hpo_winner \
  --min-checkpoints 10 --ckpt-interval 10 \
  --draws 12 --draw-seed 281 --second-draw-seed 9272 --top-k 2 \
  --deadline-hours "$left_h" --poll-s 120 --train-timeout-s 7200 \
  -o "model.hidden_node_dim=240" \
  -o "model.num_layers=6" \
  -o "trainer.learning_rate=0.08207853270831023" \
  -o "trainer.learning_rate_factor=1.0" \
  -o "trainer.learning_rate_warmup_steps=2048" \
  >> "$wd/pipeline_q38.log" 2>&1
echo "[queue38] rc=$? $(date); tail: $(tail -1 "$wd/pipeline_q38.log")"
touch "$wd/.sidecar_stop"; wait "$SIDECAR_PID" 2>/dev/null
echo "[queue38] ALL DONE $(date) — chip idle"
