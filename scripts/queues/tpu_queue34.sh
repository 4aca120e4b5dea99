#!/bin/bash
# Queue 34: chase-result archiver/committer watcher for queue33 (same
# contract as queue32 was for queue31: poll every 10 min, archive + commit
# docs/results/gt_10m_chase evidence when the chase is met, when queue33
# ends, and incrementally as scored runs appear).
# Usage: tpu_queue34.sh <queue33-pid>
set -u
WATCH_PID="${1:-}"
DEADLINE=$(( $(date +%s) + 288000 ))   # 80 h safety deadline

commit_archive() {  # $1 = reason
  cd /root/repo || return 1
  OUT=$(python scripts/archive_gt10m.py 2>&1)
  echo "[queue34] $OUT"
  # distinguish "nothing archived yet" (missing path — fine) from real
  # add failures (index lock contention etc.), which must be logged, not
  # silently swallowed skipping archival commits
  if [ ! -e docs/results/gt_10m_chase ]; then return 0; fi
  if ! ADD_ERR=$(git add docs/results/gt_10m_chase 2>&1); then
    echo "[queue34] git add failed (will retry next cycle): $ADD_ERR"
    return 0
  fi
  if ! git diff --cached --quiet -- docs/results/gt_10m_chase; then
    git commit -q \
      -m "results: GT matched-10M chase evidence ($1)" \
      -m "No-Verification-Needed: results-artifact archive only, no code change" \
      -- docs/results/gt_10m_chase && \
      echo "[queue34] committed archive ($1)"
  fi
}

alive() { [ -n "$1" ] && kill -0 "$1" 2>/dev/null; }

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  CHECK=$(python3 /root/repo/scripts/archive_gt10m.py --check 2>/dev/null)
  echo "[queue34] $(date +%H:%M) $CHECK"
  if echo "$CHECK" | grep -q '"beats_ref": true'; then
    commit_archive "chase met"
    echo "[queue34] chase MET — archived and committed $(date)"
    exit 0
  fi
  if ! alive "$WATCH_PID"; then
    commit_archive "horizon exhausted"
    echo "[queue34] queue33 finished without beating ref — evidence archived $(date)"
    exit 0
  fi
  commit_archive "incremental"
  sleep 600
done
commit_archive "watcher deadline"
echo "[queue34] ALL DONE $(date)"
