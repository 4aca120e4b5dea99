#!/bin/bash
# Queue 40 (round 3): post-queue37 chip window orchestrator.
#
# When queue37 (eqv2-10M) releases the chip:
#   1. refresh the headline bench cache (fresh uncontended line for the
#      driver's end-of-round measurement),
#   2. kernel microbench incl. the v3 streaming rows (VERDICT #2 data),
#   3. big-N rollout bench: dense vs streaming at N=256/512/1024
#      (VERDICT #5a),
#   4. hand the chip to queue39 (cgenn-10M ladder) with the remaining
#      horizon.
#
# Usage: Q40_WAIT_PID=<queue37 pid> [Q40_HORIZON_H=N] bash tpu_queue40.sh
set -u
HORIZON_H=${Q40_HORIZON_H:-6}
DEADLINE=$(( $(date +%s) + HORIZON_H * 3600 ))
LOGDIR=/root/repo/runs/r3
mkdir -p "$LOGDIR"

echo "[queue40] starting at $(date)"

if [ -n "${Q40_WAIT_PID:-}" ]; then
  echo "[queue40] waiting on pid $Q40_WAIT_PID"
  while [ -d "/proc/$Q40_WAIT_PID" ]; do
    [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue40] deadline hit while waiting"; exit 1; }
    sleep 30
  done
  echo "[queue40] pid $Q40_WAIT_PID gone at $(date)"
fi

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
until probe_backend; do
  [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue40] deadline hit in gate"; exit 1; }
  sleep 120
done

cd /root/repo
echo "[queue40] 1/5 kernel microbench $(date)"
timeout 1800 python scripts/kernel_microbench.py 16 32 64 \
  > "$LOGDIR/kernel_microbench.log" 2>&1
echo "[queue40] microbench rc=$?"

# bench-shape levers (round-1/2 VERDICT): B=128 amortization and N padded
# to the 128-sublane boundary.  Run BEFORE the headline refresh — these
# emit with the same cache key, and the cache must end on the true
# headline config (N=100 B=64).
echo "[queue40] 2/5 bench shape levers $(date)"
BENCH_BATCH=128 timeout 1200 python bench.py \
  > "$LOGDIR/bench_b128.log" 2>&1
echo "[queue40] B=128 lever: $(tail -1 "$LOGDIR/bench_b128.log")"
BENCH_N_BODIES=128 timeout 1200 python bench.py \
  > "$LOGDIR/bench_n128.log" 2>&1
echo "[queue40] N=128 lever: $(tail -1 "$LOGDIR/bench_n128.log")"

echo "[queue40] 3/5 big-N bench $(date)"
timeout 2400 python scripts/bign_bench.py > "$LOGDIR/bign_bench.log" 2>&1
echo "[queue40] bign rc=$?"

echo "[queue40] 4/5 headline bench refresh $(date)"
timeout 1200 python bench.py > "$LOGDIR/bench_refresh.log" 2>&1
echo "[queue40] bench rc=$? tail: $(tail -1 "$LOGDIR/bench_refresh.log")"

left_h=$(( (DEADLINE - $(date +%s)) / 3600 ))
[ "$left_h" -ge 1 ] || left_h=1
echo "[queue40] 5/5 chaining queue39 (cgenn-10M) with ${left_h}h $(date)"
Q39_HORIZON_H=$left_h Q39_PRIMARY_H=$left_h \
  bash /root/repo/scripts/queues/tpu_queue39.sh > "$LOGDIR/queue39.log" 2>&1
echo "[queue40] ALL DONE $(date)"
