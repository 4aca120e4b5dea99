#!/bin/bash
# Queue 30: chase-result archiver/committer watcher.
# Polls the GT-10M chase (queue28 pid $1, queue29 pid $2) every 10 min.
# Archives + commits evidence into docs/results/gt_10m_chase/ when:
#   - the chase is met (any 10M-budget artifact beats 6.9e-3), or
#   - both queues are dead (horizon exhausted), or
#   - its own 80 h safety deadline passes.
# Also does an incremental archive+commit whenever new scored evidence
# appears, so a mid-chase session hand-off or machine loss never strands
# results in /tmp.  Commits are pathspec-scoped to the archive dir so a
# concurrently-staged working tree is never swept into them.
set -u
Q28="${1:-}"
Q29="${2:-}"
DEADLINE=$(( $(date +%s) + 288000 ))

commit_archive() {  # $1 = reason
  cd /root/repo || return 1
  OUT=$(python scripts/archive_gt10m.py 2>&1)
  echo "[queue30] $OUT"
  git add docs/results/gt_10m_chase >/dev/null 2>&1 || return 0
  if ! git diff --cached --quiet -- docs/results/gt_10m_chase; then
    git commit -q \
      -m "results: GT matched-10M chase evidence ($1)" \
      -m "No-Verification-Needed: results-artifact archive only, no code change" \
      -- docs/results/gt_10m_chase && \
      echo "[queue30] committed archive ($1)"
  fi
}

alive() { [ -n "$1" ] && kill -0 "$1" 2>/dev/null; }

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  CHECK=$(python3 /root/repo/scripts/archive_gt10m.py --check 2>/dev/null)
  echo "[queue30] $(date +%H:%M) $CHECK"
  if echo "$CHECK" | grep -q '"beats_ref": true'; then
    commit_archive "chase met"
    echo "[queue30] chase MET — archived and committed $(date)"
    exit 0
  fi
  if ! alive "$Q28" && ! alive "$Q29"; then
    commit_archive "horizon exhausted"
    echo "[queue30] queues finished without beating ref — evidence archived $(date)"
    exit 0
  fi
  commit_archive "incremental"
  sleep 600
done
commit_archive "watcher deadline"
echo "[queue30] ALL DONE $(date)"
