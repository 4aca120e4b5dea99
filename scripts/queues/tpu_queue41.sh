#!/bin/bash
# Queue 41 (round 3, session 2): post-queue39 chip window.
#
# When queue39 (cgenn-10M primary) releases the chip:
#   1. eqv2-10M ckpt-80 12-draw battery (VERDICT #1 — training reached
#      epoch 82/200 before the 4 h train-timeout; in-run p 0.4899 @ ckpt 80
#      already beats the reference's 0.082, the battery completes the row
#      at the same standard as every other scoreboard row),
#   2. second-seed battery at the same checkpoint (replication, as
#      cgenn_harden_A set the standard),
#   3. big-N bench rerun — the streaming rows now compile (sender tile
#      clamped to 128 lanes; tj=256 crashed the Mosaic compiler),
#   4. kernel microbench (v3 streaming + elem_bf16 rows, VERDICT #2),
#   5. archive both 10M rows + regenerate the results CSV + commit.
#
# Usage: Q41_WAIT_PID=<queue39 pid> [Q41_HORIZON_H=N] bash tpu_queue41.sh
set -u
HORIZON_H=${Q41_HORIZON_H:-4}
DEADLINE=$(( $(date +%s) + HORIZON_H * 3600 ))
LOGDIR=/root/repo/runs/r3
mkdir -p "$LOGDIR"
EQV2_RD=/root/repo/runs/r2/eqv2_10m_L8c128/runs/equiformer_v2/2026-08-20_04-48-22__eqv2_10m_L8c128

echo "[queue41] starting at $(date)"

if [ -n "${Q41_WAIT_PID:-}" ]; then
  echo "[queue41] waiting on pid $Q41_WAIT_PID"
  while [ -d "/proc/$Q41_WAIT_PID" ]; do
    [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue41] deadline hit while waiting"; exit 1; }
    sleep 30
  done
  echo "[queue41] pid $Q41_WAIT_PID gone at $(date)"
fi

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
until probe_backend; do
  [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue41] deadline hit in gate"; exit 1; }
  sleep 120
done

cd /root/repo

echo "[queue41] 1/5 eqv2-10M ckpt-80 battery (seed 281) $(date)"
timeout 3600 python self_feed.py --run_dir "$EQV2_RD" \
  --checkpoint checkpoints/80/model.ckpt --draws 12 --seed 281 \
  --out "$EQV2_RD/draws_ckpt80" > "$LOGDIR/eqv2_draws80.log" 2>&1
echo "[queue41] battery rc=$? tail: $(tail -2 "$LOGDIR/eqv2_draws80.log" | head -1)"

echo "[queue41] 2/5 eqv2-10M ckpt-80 second-seed battery (9272) $(date)"
timeout 2400 python self_feed.py --run_dir "$EQV2_RD" \
  --checkpoint checkpoints/80/model.ckpt --draws 12 --seed 9272 \
  --out "$EQV2_RD/draws2_ckpt80" > "$LOGDIR/eqv2_draws80b.log" 2>&1
echo "[queue41] battery2 rc=$? tail: $(tail -2 "$LOGDIR/eqv2_draws80b.log" | head -1)"

echo "[queue41] 3/5 big-N bench rerun (streaming rows) $(date)"
timeout 2400 python scripts/bign_bench.py > "$LOGDIR/bign_bench2.log" 2>&1
echo "[queue41] bign rc=$?"

echo "[queue41] 4/5 kernel microbench $(date)"
timeout 1800 python scripts/kernel_microbench.py 16 32 64 \
  > "$LOGDIR/kernel_microbench2.log" 2>&1
echo "[queue41] microbench rc=$?"

echo "[queue41] 5/5 archive + report $(date)"
python scripts/archive_row.py --workdir /root/repo/runs/r2/eqv2_10m_L8c128 \
  --dest eqv2_10m_L8c128 --note "Matched-10M EquiformerV2 row (L8 c128 heads8, 9.69M params, remat). Training hit the 4 h train-timeout at epoch 82/200; the in-run series already peaks at 0.4899 @ ckpt 80 vs the reference 10M row's 0.082 @ ckpt 130 (figures/combined_pvalues_summary.csv:9), and the 12-draw batteries below complete the row at the standard scoreboard protocol." \
  >> "$LOGDIR/archive.log" 2>&1
python scripts/archive_row.py --workdir /root/repo/runs/r2/cgenn_10m_L6h176 \
  --dest cgenn_10m_L6h176 --note "Matched-10M CGENN row (L6 h176, 9.81M params, remat), 120 epochs + 12-draw batteries at top-2 checkpoints + second-seed battery (cgenn_harden_A protocol). Reference 10M row: 5.0e-100 @ ckpt 10 (figures/combined_pvalues_summary.csv:8)." \
  >> "$LOGDIR/archive.log" 2>&1
python scripts/results_report.py --no-plot >> "$LOGDIR/archive.log" 2>&1
git add docs/results && git commit -q -m "10M rows: eqv2 L8c128 batteries + cgenn L6h176; big-N streaming rows; results CSV refresh" \
  || echo "[queue41] commit failed/empty"
echo "[queue41] ALL DONE $(date) — chip idle"
