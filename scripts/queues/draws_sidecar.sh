#!/bin/bash
# Hand-off safety for battery draw summaries (round 5).
#
# snapshot_sidecar.sh archives model.ckpt + ks_summary.json, but the
# 12-draw battery outputs (draws_ckptNN/self_feed_draws.json and the
# second-seed draws2_ckptNN/) live only in the gitignored runs/ tree —
# a machine hand-off between battery completion and archive_row.py
# loses them (this is exactly how the round-3 SEGNN/PONITA/GT batteries
# became unreplicable).  This watcher mirrors every battery summary under
# runs/<root>/<tag>/runs/<model>/<run>/draws*_ckptNN/ into the committed
# docs/results/<tag>_partial/draws/ directory and commits via a
# temporary index (same hygiene as snapshot_sidecar.sh: the builder's
# own index is never touched; commits amend while HEAD is this
# watcher's own commit so history carries one live blob set).
#
# Usage: draws_sidecar.sh <runs-root> [interval_s=300] [deadline_epoch]
set -u
REPO=${SIDECAR_REPO:-/root/repo}
ROOT=${1:?usage: draws_sidecar.sh <runs-root> [interval_s] [deadline_epoch]}
INTERVAL=${2:-300}
DEADLINE=${3:-$(( $(date +%s) + 86400 ))}
SUBJ="partial snapshot: battery draws (hand-off safety sidecar)"

echo "[draws-sidecar] watching $ROOT every ${INTERVAL}s"
napped=$INTERVAL   # first scan immediately
while [ ! -e "$ROOT/.draws_sidecar_stop" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if [ "$napped" -lt "$INTERVAL" ]; then
    sleep 1; napped=$((napped + 1)); continue
  fi
  napped=0
  CHANGED=0
  DESTS=""
  # every completed battery summary (+ its per-draw ks payloads are tiny
  # JSONs too, but the summary alone re-derives the headline numbers)
  for f in "$ROOT"/*/runs/*/*/draws*_ckpt*/self_feed_draws.json; do
    [ -f "$f" ] || continue
    battery_dir=$(dirname "$f")                     # .../draws_ckptNN
    run_dir=$(dirname "$battery_dir")               # .../<run>
    tag=$(basename "$(dirname "$(dirname "$(dirname "$run_dir")")")")
    # already archived into the final row by archive_row.py -> nothing to protect
    [ -f "$REPO/docs/results/${tag}/$(basename "$battery_dir").json" ] && continue
    dest="$REPO/docs/results/${tag}_partial/draws/$(basename "$battery_dir")"
    if [ ! -f "$dest/self_feed_draws.json" ] || \
       [ "$f" -nt "$dest/self_feed_draws.json" ]; then
      mkdir -p "$dest"
      cp "$f" "$dest/self_feed_draws.json"
      # keep the per-draw KS summaries when present (small JSONs)
      for d in "$battery_dir"/draw_*/ks_summary.json; do
        [ -f "$d" ] || continue
        dd="$dest/$(basename "$(dirname "$d")")"
        mkdir -p "$dd" && cp "$d" "$dd/"
      done
      CHANGED=1
      # literal dir paths: a wildcard pathspec ('*_partial/draws') only
      # dir-prefix-matches when it has no glob magic, so `git add` with
      # the glob finds nothing (observed 21:49Z) — add each concrete dir
      case " $DESTS " in
        *" docs/results/${tag}_partial/draws "*) ;;
        *) DESTS="$DESTS docs/results/${tag}_partial/draws" ;;
      esac
      echo "[draws-sidecar] mirrored $battery_dir -> $dest"
    fi
  done
  [ "$CHANGED" = 1 ] || continue
  TMPIDX=$(mktemp -u "$REPO/.git/draws_index.XXXXXX")
  if ! ADD_ERR=$(GIT_INDEX_FILE="$TMPIDX" sh -c \
      "git -C '$REPO' read-tree HEAD && git -C '$REPO' add $DESTS" 2>&1); then
    echo "[draws-sidecar] git add failed (retry next cycle): $ADD_ERR"
    rm -f "$TMPIDX"; continue
  fi
  if ! GIT_INDEX_FILE="$TMPIDX" git -C "$REPO" diff --cached --quiet; then
    AMEND=""
    [ "$(git -C "$REPO" log -1 --format=%s 2>/dev/null)" = "$SUBJ" ] && AMEND="--amend"
    if GIT_INDEX_FILE="$TMPIDX" git -C "$REPO" commit -q $AMEND -m "$SUBJ"; then
      git -C "$REPO" add docs/results/*_partial/draws 2>/dev/null || true
      echo "[draws-sidecar] committed at $(date -u +%T)"
    else
      echo "[draws-sidecar] git commit failed (retry next cycle)"
    fi
  fi
  rm -f "$TMPIDX"
done
echo "[draws-sidecar] done at $(date)"
