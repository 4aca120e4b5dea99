#!/bin/bash
# Queue 43 (round 3, continuation session): finish the cgenn-10M protocol.
# Queue 39's L6h176 run was deadline-cut at epoch ~99/120 (stale-orchestrator
# pileup at the 10:35 chip window); the harden_A study showed CGENN's long
# tail climbs out around ckpt 110+, so the cut row never saw its best region.
# This queue resumes from the committed partial snapshot (epoch 90, extracted
# from git blob 5c26349) and trains to 130 (floor 120 + one tail checkpoint, fitted to the session clock), then runs the queue39 battery
# protocol (12 draws, top-2 checkpoints, second seed) on the late checkpoints.
set -u
WD=/root/repo/runs/r3/cgenn_10m_L6h176
SIDECAR=/root/repo/scripts/queues/snapshot_sidecar.sh
DEADLINE=$(( $(date +%s) + 6000 ))
mkdir -p "$WD"
# seed from git history when the workdir is empty (runs/ is wiped on
# machine hand-off) — without this, pipeline.py's continuation_ckpt()
# returns None on an empty workdir and trains FROM SCRATCH under the
# _cont run name (advisor finding, round 3)
if [ -z "$(ls -t "$WD"/runs/*/*/model.ckpt 2>/dev/null | head -1)" ]; then
  d="$WD/runs/cgenn/$(date -u +%Y-%m-%d_%H-%M-%S)__seeded_from_git"
  mkdir -p "$d"
  git -C /root/repo cat-file blob \
    "5c26349:docs/results/cgenn_10m_L6h176_partial/model.ckpt" > "$d/model.ckpt" \
    || { echo "[queue43] seed extraction failed"; exit 1; }
  echo "[queue43] seeded epoch-90 snapshot from git into $d"
fi
rm -f "$WD/.sidecar_stop"
bash "$SIDECAR" watch "$WD" "cgenn_10m_L6h176" 600 "$DEADLINE" >> "$WD/sidecar.log" 2>&1 &
SIDECAR_PID=$!
python /root/repo/scripts/pipeline.py --workdir "$WD" \
  --model cgenn --epochs 130 --run-name "cgenn_10m_L6h176_cont" \
  --min-checkpoints 10 --ckpt-interval 10 \
  --draws 12 --draw-seed 281 --second-draw-seed 9272 --top-k 2 \
  --deadline-hours 1.0 --poll-s 120 --train-timeout-s 4200 \
  -o "model.num_layers=6" \
  -o "model.hidden_features=176" \
  -o "model.remat=true" \
  >> "$WD/pipeline_q43.log" 2>&1
echo "[queue43] pipeline rc=$? $(date)"
touch "$WD/.sidecar_stop"; wait "$SIDECAR_PID" 2>/dev/null
echo "[queue43] DONE $(date)"
