#!/bin/bash
# Queue 44 (round 3, authored for the next chip window): continue the
# matched-10M EquiformerV2 row past its 4 h train-timeout cut.
#
# Queue 37's L8c128 run (9.69M params) stopped at epoch 82/200; its row
# already beats the reference 10M cell 10x (battery best 0.859 / median
# 0.2825 vs 0.082 @ ckpt 130), but the reference's own best checkpoint for
# this family lands at ckpt 130 — the run never reached the region where the
# reference peaked.  This queue resumes from the committed epoch-80 partial
# snapshot (git blob 9dd3d8a, dropped from the worktree in 4fadb74) and
# trains to 140, then reruns the battery protocol at the top-2 late
# checkpoints.
#
# Usage: [Q44_EPOCHS=140] [Q44_HORIZON_H=3] bash tpu_queue44.sh
set -u
EPOCHS=${Q44_EPOCHS:-140}
HORIZON_H=${Q44_HORIZON_H:-3}
WD=/root/repo/runs/r3/eqv2_10m_L8c128
SIDECAR=/root/repo/scripts/queues/snapshot_sidecar.sh
DEADLINE=$(( $(date +%s) + HORIZON_H * 3600 ))

mkdir -p "$WD"
# seed from git history when the workdir is empty (runs/ is wiped on
# machine hand-off; the worktree partial dir was dropped in 4fadb74 but the
# blob is reachable from the snapshot commit)
if [ -z "$(ls -t "$WD"/runs/*/*/model.ckpt 2>/dev/null | head -1)" ]; then
  d="$WD/runs/equiformer_v2/$(date -u +%Y-%m-%d_%H-%M-%S)__seeded_from_git"
  mkdir -p "$d"
  git -C /root/repo cat-file blob \
    "9dd3d8a:docs/results/eqv2_10m_L8c128_partial/model.ckpt" > "$d/model.ckpt" \
    || { echo "[queue44] seed extraction failed"; exit 1; }
  echo "[queue44] seeded epoch-80 snapshot from git into $d"
fi

rm -f "$WD/.sidecar_stop"
bash "$SIDECAR" watch "$WD" "eqv2_10m_L8c128" 600 "$DEADLINE" >> "$WD/sidecar.log" 2>&1 &
SIDECAR_PID=$!
python /root/repo/scripts/pipeline.py --workdir "$WD" \
  --model equiformer_v2 --epochs "$EPOCHS" --run-name "eqv2_10m_L8c128_cont" \
  --min-checkpoints 10 --ckpt-interval 10 \
  --draws 12 --draw-seed 281 --second-draw-seed 9272 --top-k 2 \
  --deadline-hours "$HORIZON_H" --poll-s 120 --train-timeout-s 10800 \
  -o "model.num_layers=8" \
  -o "model.sphere_channels=128" \
  -o "model.attn_hidden_channels=128" \
  -o "model.ffn_hidden_channels=128" \
  -o "model.num_heads=8" \
  -o "model.remat=true" \
  >> "$WD/pipeline_q44.log" 2>&1
echo "[queue44] pipeline rc=$? $(date)"
touch "$WD/.sidecar_stop"; wait "$SIDECAR_PID" 2>/dev/null
echo "[queue44] DONE $(date)"
