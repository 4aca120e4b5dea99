#!/bin/bash
# Auto-archive completed ladder steps (round 5).
#
# The queue's pipeline.py prints a final {"status": "ok", ...} JSON line
# when a step's train+score+battery chain completes, but turning the
# workdir into a committed docs/results/<tag>/ row (archive_row.py) was a
# manual act — a machine hand-off between pipeline completion and the
# next interactive session would leave the row unarchived (batteries are
# protected by draws_sidecar.sh, but the assembled row + kept headline
# checkpoint would not exist).  This watcher closes that window: when a
# workdir under <runs-root> has a completed pipeline and no final row
# yet, it runs archive_row.py, regenerates the results CSV, and commits.
#
# Usage: auto_archive.sh <runs-root> [interval_s=120] [deadline_epoch]
set -u
REPO=${SIDECAR_REPO:-/root/repo}
ROOT=${1:?usage: auto_archive.sh <runs-root> [interval_s] [deadline_epoch]}
INTERVAL=${2:-120}
DEADLINE=${3:-$(( $(date +%s) + 86400 ))}

echo "[auto-archive] watching $ROOT every ${INTERVAL}s"
napped=$INTERVAL
while [ ! -e "$ROOT/.auto_archive_stop" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if [ "$napped" -lt "$INTERVAL" ]; then
    sleep 1; napped=$((napped + 1)); continue
  fi
  napped=0
  for wd in "$ROOT"/*/; do
    [ -f "$wd/pipeline.log" ] || continue
    tag=$(basename "$wd")
    [ -d "$REPO/docs/results/$tag" ] && continue
    # completed = the LAST pipeline status line says ok (a queue46 retry
    # of the same workdir appends; only the newest verdict counts)
    last=$(grep -o '"status": "[a-z]*"' "$wd/pipeline.log" | tail -1)
    case "$last" in
      *'"ok"'*) ;;
      *) continue ;;
    esac
    echo "[auto-archive] archiving $tag"
    if python "$REPO/scripts/archive_row.py" --workdir "$wd" --dest "$tag" \
         --note "auto-archived by queue48's completion watcher (round 5)" \
         >> "$wd/auto_archive.log" 2>&1; then
      python "$REPO/scripts/results_report.py" >> "$wd/auto_archive.log" 2>&1 || true
      git -C "$REPO" add "docs/results/$tag" \
        docs/results/combined_pvalues_summary.csv \
        docs/results/combined_pvalues_multi.png 2>> "$wd/auto_archive.log"
      if git -C "$REPO" commit -q -m "$tag: row auto-archived on pipeline completion (batteries + kept headline ckpt)"; then
        echo "[auto-archive] committed $tag"
      else
        echo "[auto-archive] commit failed for $tag (see git status)"
      fi
    else
      echo "[auto-archive] archive_row failed for $tag (see $wd/auto_archive.log)"
    fi
  done
done
echo "[auto-archive] done at $(date)"
