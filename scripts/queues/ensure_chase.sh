#!/bin/bash
# Idempotent GT-10M chase (re)launcher.  Machine hand-offs wipe /tmp (pid
# files + any processes), but the chase workdirs live under the repo's
# gitignored runs/gt10m/ and pipeline.py resumes from checkpoint snapshots
# — so recovery is just "start the queue again".  This script does that
# safely: it starts queue33 (candidate ladder) and queue34 (evidence
# watcher) only if they are not already running.
#
# Usage:  bash scripts/queues/ensure_chase.sh
set -u
QDIR=/root/repo/scripts/queues
LOGDIR=/root/repo/runs/gt10m
mkdir -p "$LOGDIR"

# alive <pidfile> <queue-name>: the pid must exist AND its cmdline must
# actually be that queue script — a recycled pid after reboot would otherwise
# read as "alive" for an unrelated process and silently block chase recovery
alive() {
  local pid
  pid=$(cat "$1" 2>/dev/null) || return 1
  [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null || return 1
  tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null | grep -q "$2"
}

# nothing to do if the chase is already met
if python3 /root/repo/scripts/archive_gt10m.py --check 2>/dev/null \
    | grep -q '"beats_ref": true'; then
  echo "[ensure_chase] chase already met — not relaunching"
  exit 0
fi

if alive /tmp/tpu_queue33.pid tpu_queue33; then
  echo "[ensure_chase] queue33 alive (pid $(cat /tmp/tpu_queue33.pid))"
else
  nohup bash "$QDIR/tpu_queue33.sh" >> "$LOGDIR/queue33.out" 2>&1 &
  echo $! > /tmp/tpu_queue33.pid
  echo "[ensure_chase] queue33 relaunched (pid $(cat /tmp/tpu_queue33.pid))"
fi

if alive /tmp/tpu_queue34.pid tpu_queue34; then
  echo "[ensure_chase] queue34 alive (pid $(cat /tmp/tpu_queue34.pid))"
else
  nohup bash "$QDIR/tpu_queue34.sh" "$(cat /tmp/tpu_queue33.pid)" \
    >> "$LOGDIR/queue34.out" 2>&1 &
  echo $! > /tmp/tpu_queue34.pid
  echo "[ensure_chase] queue34 relaunched (pid $(cat /tmp/tpu_queue34.pid))"
fi
