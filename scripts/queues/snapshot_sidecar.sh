#!/bin/bash
# Hand-off-safe training snapshots for chip queues.
#
# runs/ is gitignored and WIPED when the builder machine hands off mid-queue
# (it happened to queue38 on 2026-08-19: epoch 23/120 lost until a manual
# archive was committed).  This sidecar makes any pipeline.py run resumable
# across hand-offs by mirroring its newest trainer snapshot into the
# committed docs/results/<tag>_partial/ directory:
#
#   seed  <workdir> <model> <tag>   - before launching the pipeline: if a
#                                     committed partial exists and the workdir
#                                     has no runs yet, plant it where
#                                     pipeline.continuation_ckpt() will find
#                                     it (workdir/runs/<model>/<dir>/model.ckpt)
#   watch <workdir> <tag> [interval_s=600] [deadline_epoch]
#                                   - loop: copy the newest model.ckpt (+ its
#                                     run's ks_summary.json) into the archive
#                                     and commit.  Exits on deadline or when
#                                     <workdir>/.sidecar_stop appears.
#
# model.ckpt is written atomically (checkpoint.py: tmp + os.replace), so a
# live copy always reads a complete snapshot.  Commits touch only the
# archive path; add failures are logged, not swallowed (ADVICE round-1).
#
# History hygiene (ADVICE round-2): each snapshot is ~22MB; committing a new
# blob every cycle balloons git history over a multi-hour run.  The watch
# loop therefore AMENDS the previous snapshot commit whenever HEAD is this
# tag's own snapshot commit (keeping exactly one live blob per tag between
# builder commits), and stages through a temporary index (GIT_INDEX_FILE)
# so a failed/racing commit can never leave the partial staged in the
# builder's index.
set -u
REPO=${SIDECAR_REPO:-/root/repo}   # override for tests
CMD=${1:?usage: snapshot_sidecar.sh seed|watch ...}

newest_ckpt() {  # $1=workdir -> newest model.ckpt under runs/*/*/ (or empty)
  ls -t "$1"/runs/*/*/model.ckpt 2>/dev/null | head -1
}

case "$CMD" in
  seed)
    WD=${2:?workdir}; MODEL=${3:?model}; TAG=${4:?tag}
    SEED="$REPO/docs/results/${TAG}_partial/model.ckpt"
    if [ -f "$SEED" ] && [ -z "$(newest_ckpt "$WD")" ]; then
      d="$WD/runs/$MODEL/$(date -u +%Y-%m-%d_%H-%M-%S)__seeded_from_archive"
      mkdir -p "$d"
      cp "$SEED" "$d/model.ckpt"
      echo "[sidecar] seeded $WD from ${TAG}_partial"
    else
      echo "[sidecar] no seed for $TAG (archive absent or workdir has runs)"
    fi
    ;;
  watch)
    WD=${2:?workdir}; TAG=${3:?tag}
    INTERVAL=${4:-600}; DEADLINE=${5:-$(( $(date +%s) + 86400 ))}
    DEST="$REPO/docs/results/${TAG}_partial"
    SUBJ="partial snapshot: ${TAG} (hand-off safety sidecar)"
    echo "[sidecar] watching $WD -> $DEST every ${INTERVAL}s"
    # sleep in short slices so `touch .sidecar_stop` stops the watch within
    # seconds instead of stalling the queue by a full in-flight INTERVAL
    # (ADVICE round-2)
    napped=0
    while [ ! -e "$WD/.sidecar_stop" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
      if [ "$napped" -lt "$INTERVAL" ]; then
        sleep 1; napped=$((napped + 1)); continue
      fi
      napped=0
      src=$(newest_ckpt "$WD")
      [ -n "$src" ] || continue
      # only re-archive when the trainer actually wrote a newer snapshot
      if [ -f "$DEST/model.ckpt" ] && [ ! "$src" -nt "$DEST/model.ckpt" ]; then
        continue
      fi
      mkdir -p "$DEST"
      cp "$src" "$DEST/model.ckpt.tmp" && mv "$DEST/model.ckpt.tmp" "$DEST/model.ckpt"
      run_dir=$(dirname "$src")
      [ -f "$run_dir/ks_summary.json" ] && cp "$run_dir/ks_summary.json" "$DEST/"
      printf '{"tag": "%s", "src": "%s", "archived_at": "%s"}\n' \
        "$TAG" "$src" "$(date -u +%FT%TZ)" > "$DEST/snapshot.json"
      # Stage through a temporary index: the builder's own index is never
      # touched, so a failed commit can't leave the partial staged there.
      # -u: git refuses a pre-created empty index file; the path must not exist
      TMPIDX=$(mktemp -u "$REPO/.git/sidecar_index.XXXXXX")
      if git -C "$REPO" rev-parse -q --verify HEAD >/dev/null 2>&1; then
        BASE="git -C '$REPO' read-tree HEAD &&"
      else
        BASE=""   # unborn HEAD (fresh repo): start from an empty index
      fi
      if ! ADD_ERR=$(GIT_INDEX_FILE="$TMPIDX" sh -c \
          "$BASE git -C '$REPO' add 'docs/results/${TAG}_partial'" 2>&1); then
        echo "[sidecar] git add failed (retry next cycle): $ADD_ERR"
        rm -f "$TMPIDX"; continue
      fi
      if ! GIT_INDEX_FILE="$TMPIDX" git -C "$REPO" diff --cached --quiet -- "docs/results/${TAG}_partial"; then
        # Amend when HEAD is already this tag's snapshot commit: keeps ONE
        # live ~22MB blob per tag in history instead of one per cycle.
        AMEND=""
        [ "$(git -C "$REPO" log -1 --format=%s 2>/dev/null)" = "$SUBJ" ] && AMEND="--amend"
        if GIT_INDEX_FILE="$TMPIDX" git -C "$REPO" commit -q $AMEND -m "$SUBJ"; then
          # sync the MAIN index with the new HEAD for these paths, else
          # `git status` shows them as staged deletions to the builder
          git -C "$REPO" add "docs/results/${TAG}_partial" 2>/dev/null || true
        else
          echo "[sidecar] git commit failed (retry next cycle)"
        fi
      fi
      rm -f "$TMPIDX"
      echo "[sidecar] archived $src at $(date -u +%T)"
    done
    echo "[sidecar] done ($TAG) at $(date)"
    ;;
  *)
    echo "unknown subcommand: $CMD" >&2; exit 2 ;;
esac
