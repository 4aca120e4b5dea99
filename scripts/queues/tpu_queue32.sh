#!/bin/bash
# Queue 32: chase-result archiver/committer watcher for queue31.
# Polls the GT-10M chase every 10 min; archives + commits evidence into
# docs/results/gt_10m_chase/ when the chase is met, when queue31 ends
# (horizon exhausted), or incrementally as scored runs appear — so a
# session hand-off or machine loss never strands results in /tmp.
# Commits are pathspec-scoped to the archive dir.
# Usage: tpu_queue32.sh <queue31-pid>
set -u
WATCH_PID="${1:-}"
DEADLINE=$(( $(date +%s) + 288000 ))   # 80 h safety deadline

commit_archive() {  # $1 = reason
  cd /root/repo || return 1
  OUT=$(python scripts/archive_gt10m.py 2>&1)
  echo "[queue32] $OUT"
  git add docs/results/gt_10m_chase >/dev/null 2>&1 || return 0
  if ! git diff --cached --quiet -- docs/results/gt_10m_chase; then
    git commit -q \
      -m "results: GT matched-10M chase evidence ($1)" \
      -m "No-Verification-Needed: results-artifact archive only, no code change" \
      -- docs/results/gt_10m_chase && \
      echo "[queue32] committed archive ($1)"
  fi
}

alive() { [ -n "$1" ] && kill -0 "$1" 2>/dev/null; }

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  CHECK=$(python3 /root/repo/scripts/archive_gt10m.py --check 2>/dev/null)
  echo "[queue32] $(date +%H:%M) $CHECK"
  if echo "$CHECK" | grep -q '"beats_ref": true'; then
    commit_archive "chase met"
    echo "[queue32] chase MET — archived and committed $(date)"
    exit 0
  fi
  if ! alive "$WATCH_PID"; then
    commit_archive "horizon exhausted"
    echo "[queue32] queue31 finished without beating ref — evidence archived $(date)"
    exit 0
  fi
  commit_archive "incremental"
  sleep 600
done
commit_archive "watcher deadline"
echo "[queue32] ALL DONE $(date)"
