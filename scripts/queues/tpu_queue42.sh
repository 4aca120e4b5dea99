#!/bin/bash
# Queue 42 (round 3, session 2): deadline-fit endgame for the two 10M rows.
#
# The round ends ~12:10Z; cgenn-10M training alone would run to ~11:31 and
# queue39's own score+draws would overflow the round.  This queue:
#   1. lets cgenn-10M train to checkpoint 100 (or a hard wall time),
#      then stops the queue39 pipeline + trainer (checkpoints are on disk;
#      the row documents the deadline cut — cgenn_harden_A's best battery
#      came from ckpt 50, so a 100-epoch series supports the protocol),
#   2. scores the cgenn run on CPU while the chip runs the eqv2-10M
#      ckpt-80 12-draw battery (VERDICT #1),
#   3. runs the cgenn 12-draw battery at its best in-run checkpoint,
#   4. reruns the big-N bench (streaming rows now compile after the
#      tile clamp),
#   5. archives both rows + regenerates the results CSV + commits,
#      leaving the chip idle for the driver's end-of-round bench.
#
# Usage: Q42_PIPELINE_PID=.. Q42_TRAIN_PID=.. bash tpu_queue42.sh
set -u
CUT_EPOCH=${Q42_CUT_EPOCH:-100}
CUT_WALL=${Q42_CUT_WALL:-"11:08"}   # UTC HH:MM hard cut
PIPE_PID=${Q42_PIPELINE_PID:?}
TRAIN_PID=${Q42_TRAIN_PID:?}
CG_WD=/root/repo/runs/r2/cgenn_10m_L6h176
CG_RD=$CG_WD/runs/cgenn/2026-08-20_09-02-53__cgenn_10m_L6h176
EQV2_RD=/root/repo/runs/r2/eqv2_10m_L8c128/runs/equiformer_v2/2026-08-20_04-48-22__eqv2_10m_L8c128
LOGDIR=/root/repo/runs/r3
mkdir -p "$LOGDIR"
cd /root/repo

cut_due() {
  # a checkpoint is only scoreable once its self-feed macro artifacts are
  # written (ks_test reads them) — gate on the LAST artifact of the set,
  # not the directory (which appears first with just model.ckpt)
  [ -f "$CG_RD/checkpoints/$CUT_EPOCH/nbody_macro_metrics.json" ] && return 0
  [ "$(date -u +%H:%M)" \> "$CUT_WALL" ] && return 0
  return 1
}

echo "[queue42] waiting for ckpt $CUT_EPOCH or $CUT_WALL UTC $(date)"
until cut_due; do
  # if the pipeline finished on its own, stop waiting
  [ -d "/proc/$PIPE_PID" ] || break
  sleep 20
done

if [ -d "/proc/$PIPE_PID" ]; then
  echo "[queue42] cutting cgenn train at $(date) (ckpts: $(ls "$CG_RD/checkpoints" 2>/dev/null | sort -n | tail -1))"
  # pipeline first so it cannot relaunch a fresh attempt, then the trainer;
  # the current train pid may have rotated — read the pipeline's children
  kids=$(cat /proc/$PIPE_PID/task/*/children 2>/dev/null)
  kill "$PIPE_PID" 2>/dev/null
  for k in $TRAIN_PID $kids; do kill "$k" 2>/dev/null; done
  sleep 10
  for k in $TRAIN_PID $kids; do kill -9 "$k" 2>/dev/null; done
  touch "$CG_WD/.sidecar_stop"
fi

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
until probe_backend; do echo "[queue42] probe wait $(date)"; sleep 30; done

echo "[queue42] scoring cgenn on CPU (background) $(date)"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu nohup python ks_test.py "$CG_RD" \
  > "$LOGDIR/cgenn_score.log" 2>&1 &
SCORE_PID=$!

echo "[queue42] 1/4 eqv2-10M ckpt-80 battery (seed 281) $(date)"
timeout 1800 python self_feed.py --run_dir "$EQV2_RD" \
  --checkpoint checkpoints/80/model.ckpt --draws 12 --seed 281 \
  --out "$EQV2_RD/draws_ckpt80" > "$LOGDIR/eqv2_draws80.log" 2>&1
echo "[queue42] eqv2 battery rc=$? tail: $(grep 'combined macro p' "$LOGDIR/eqv2_draws80.log" | tail -1)"

echo "[queue42] 2/4 cgenn battery at best in-run ckpt $(date)"
wait "$SCORE_PID" 2>/dev/null
BEST_CK=$(python - <<'EOF'
import json
s = json.load(open("/root/repo/runs/r2/cgenn_10m_L6h176/runs/cgenn/2026-08-20_09-02-53__cgenn_10m_L6h176/ks_summary.json"))
rs = s.get("results", [])
print(max(rs, key=lambda r: r.get("combined_pvalue", 0.0))["checkpoint"] if rs else "")
EOF
)
echo "[queue42] cgenn best in-run ckpt: $BEST_CK"
if [ -n "$BEST_CK" ]; then
  timeout 1500 python self_feed.py --run_dir "$CG_RD" \
    --checkpoint "checkpoints/$BEST_CK/model.ckpt" --draws 12 --seed 281 \
    --out "$CG_RD/draws_ckpt$BEST_CK" > "$LOGDIR/cgenn_draws.log" 2>&1
  echo "[queue42] cgenn battery rc=$? tail: $(grep 'combined macro p' "$LOGDIR/cgenn_draws.log" | tail -1)"
fi

echo "[queue42] 3/4 big-N bench rerun (streaming rows) $(date)"
timeout 1500 python scripts/bign_bench.py > "$LOGDIR/bign_bench2.log" 2>&1
echo "[queue42] bign rc=$?"

echo "[queue42] 4/4 archive + report $(date)"
python scripts/archive_row.py --workdir /root/repo/runs/r2/eqv2_10m_L8c128 \
  --dest eqv2_10m_L8c128 --note "Matched-10M EquiformerV2 row (L8 c128 heads8, 9.69M params, remat). Training hit the 4 h train-timeout at epoch 82/200; the in-run series peaks at 0.4899 @ ckpt 80 vs the reference 10M row's 0.082 @ ckpt 130 (figures/combined_pvalues_summary.csv:9); 12-draw battery at ckpt 80 completes the row at the standard protocol." \
  >> "$LOGDIR/archive.log" 2>&1
python scripts/archive_row.py --workdir "$CG_WD" \
  --dest cgenn_10m_L6h176 --note "Matched-10M CGENN row (L6 h176, 9.81M params, remat). Deadline-cut at epoch ~100/120 (round end); 12-draw battery at the best in-run checkpoint. Reference 10M row: 5.0e-100 @ ckpt 10 (figures/combined_pvalues_summary.csv:8)." \
  >> "$LOGDIR/archive.log" 2>&1
python scripts/results_report.py --no-plot >> "$LOGDIR/archive.log" 2>&1
git add docs/results && git commit -q -m "10M rows archived: eqv2 L8c128 (ckpt-80 battery) + cgenn L6h176; big-N streaming rows; results CSV refresh" \
  || echo "[queue42] commit failed/empty"
echo "[queue42] ALL DONE $(date) — chip idle"
