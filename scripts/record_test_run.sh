#!/bin/bash
# Run a pytest tier and append an auditable provenance line to
# docs/results/test_runs.jsonl (round-2 VERDICT #8: "N green" claims must
# be per-commit auditable, not prose).
#
# Usage: scripts/record_test_run.sh [full|core] [extra pytest args...]
# Cadence policy (documented here, the tool enforces the record): the CORE
# tier gates every chip-facing commit (fast, ~5 min); the FULL tier runs at
# least once per round on the round's final source state.
set -u
TIER=${1:-full}; shift || true
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
if [ "$TIER" = core ]; then
  ARGS=(-q -m "not slow")
else
  ARGS=(-q)
fi
LOG=$(mktemp /tmp/test_run.XXXXXX.log)
START=$(date +%s)
python -m pytest tests/ "${ARGS[@]}" "$@" > "$LOG" 2>&1
RC=$?
WALL=$(( $(date +%s) - START ))
SUMMARY=$(grep -E '^[0-9]+ (passed|failed)|passed|failed' "$LOG" | tail -1 | head -c 160)
PASSED=$(echo "$SUMMARY" | grep -oE '[0-9]+ passed' | grep -oE '[0-9]+' || echo 0)
FAILED=$(echo "$SUMMARY" | grep -oE '[0-9]+ failed' | grep -oE '[0-9]+' || echo 0)
SHA=$(git rev-parse --short HEAD)
# dirty = uncommitted SOURCE state.  PROGRESS.jsonl is the round driver's
# heartbeat log, rewritten continuously between commits — it made every
# long-running tier record dirty:true (round-4: a 270-green full tier at
# the round-end sha flagged dirty by the heartbeat alone), so it is
# excluded from the provenance flag.
DIRTY=false
git diff --quiet -- . ':(exclude)PROGRESS.jsonl' \
  && git diff --cached --quiet -- . ':(exclude)PROGRESS.jsonl' || DIRTY=true
printf '{"sha": "%s", "dirty": %s, "tier": "%s", "passed": %s, "failed": %s, "wall_s": %s, "rc": %s, "summary": "%s", "at": "%s"}\n' \
  "$SHA" "$DIRTY" "$TIER" "${PASSED:-0}" "${FAILED:-0}" "$WALL" "$RC" \
  "$SUMMARY" "$(date -u +%FT%TZ)" >> docs/results/test_runs.jsonl
tail -1 docs/results/test_runs.jsonl
exit $RC
