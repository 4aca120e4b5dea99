#!/bin/bash
# Run the FULL test suite (slow tier included) and append one provenance
# line to docs/results/test_runs.jsonl: commit sha, pass/fail counts,
# wall-clock.  Round-2 VERDICT #8: "235 green" claims must be auditable
# per commit, not live in BENCH_NOTES prose.
#
# Usage: bash scripts/full_suite.sh [extra pytest args...]
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT="$REPO/docs/results/test_runs.jsonl"
SHA=$(git -C "$REPO" rev-parse --short HEAD 2>/dev/null || echo unknown)
DIRTY=$(git -C "$REPO" status --porcelain 2>/dev/null | grep -q . && echo true || echo false)
T0=$(date +%s)
LOG=$(mktemp /tmp/full_suite.XXXXXX.log)
(cd "$REPO" && python -m pytest tests/ -q "$@") 2>&1 | tee "$LOG"
RC=${PIPESTATUS[0]}
WALL=$(( $(date +%s) - T0 ))
# parse the pytest summary tail, e.g. "235 passed, 1 skipped in 1712.33s"
SUMMARY=$(grep -Eo '[0-9]+ (passed|failed|error|skipped|deselected)[^=]*in [0-9.]+s' "$LOG" | tail -1)
PASSED=$(grep -Eo '[0-9]+ passed' <<<"$SUMMARY" | grep -Eo '[0-9]+' || echo 0)
FAILED=$(grep -Eo '[0-9]+ (failed|error)' <<<"$SUMMARY" | grep -Eo '[0-9]+' | head -1 || echo 0)
printf '{"sha": "%s", "dirty": %s, "passed": %s, "failed": %s, "wall_s": %s, "rc": %s, "summary": "%s", "at": "%s"}\n' \
  "$SHA" "$DIRTY" "${PASSED:-0}" "${FAILED:-0}" "$WALL" "$RC" "$SUMMARY" "$(date -u +%FT%TZ)" >> "$OUT"
echo "[full_suite] appended provenance line to $OUT (rc=$RC)"
rm -f "$LOG"
exit "$RC"
