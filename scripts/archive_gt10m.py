"""Archive GT matched-10M chase artifacts from /tmp workdirs into the repo.

The chase (scripts/queues/tpu_queue28.sh + tpu_queue29.sh) trains
10M-budget Graph Transformer candidates under ``/tmp/gt_10m_*`` — scratch
space that does not survive the machine.  This archiver copies every
scored run's lightweight evidence (ks_summary/csv/png, draw batteries,
config) into ``docs/results/gt_10m_chase/<workdir-name>/`` and writes a
top-level README with the global best, in the same layout as the other
``docs/results`` folders.  Idempotent: re-runs refresh in place.

Usage::

    python scripts/archive_gt10m.py          # archive + print summary
    python scripts/archive_gt10m.py --check  # print global best only
"""

import glob
import json
import os
import shutil
import sys

REF_P = 0.0069  # reference GT ~10M best (combined_pvalues_summary.csv:7)
OUT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "results", "gt_10m_chase",
)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# /tmp did not survive the 2026-08-19 machine hand-off (queues + partial
# runs lost), so queue33+ keeps chase workdirs under the repo's gitignored
# runs/ instead; both locations stay scanned for continuity.
WORKDIR_GLOBS = [
    "/tmp/gt_10m_deep*",
    "/tmp/gt_10m_h4*",
    os.path.join(_REPO_ROOT, "runs", "gt10m", "gt_10m_deep*"),
    os.path.join(_REPO_ROOT, "runs", "gt10m", "gt_10m_h4*"),
]


def chase_runs():
    """(workdir, [run dirs, oldest first]) for every chase workdir with any
    run.  ALL run dirs matter, not just the newest: a resumed candidate
    (pipeline.py continuation_ckpt) appends a fresh run dir holding only the
    epochs it added, so scored summaries and draw batteries are split across
    the whole series — the best evidence can live in an ancestor."""
    out = []
    for pat in WORKDIR_GLOBS:
        for wd in sorted(glob.glob(pat)):
            # oldest first by the run-dir basename timestamp
            # (YYYY-MM-DD_HH-MM-SS sorts lexicographically); directory mtime
            # is NOT creation order — late writes into an ancestor run dir
            # (pipeline.py scores/draws every run dir) would reorder it
            runs = sorted(
                (r for r in glob.glob(os.path.join(wd, "runs", "*", "*"))
                 if os.path.isdir(r)),
                key=os.path.basename,
            )
            if runs:
                out.append((wd, runs))
    return out


def best_of_run(run_dir):
    """(best combined p, provenance string) across in-run scoring and all
    draw batteries of one run dir."""
    best, where = 0.0, ""
    ks = os.path.join(run_dir, "ks_summary.json")
    try:
        with open(ks) as f:
            for r in json.load(f)["results"]:
                if r["combined_pvalue"] > best:
                    best, where = r["combined_pvalue"], f"in-run ckpt {r['checkpoint']}"
    except Exception:
        pass
    for f_ in glob.glob(os.path.join(run_dir, "draws*_ckpt*", "self_feed_draws.json")):
        try:
            with open(f_) as fh:
                for x in json.load(fh)["draws"]:
                    if x["combined_pvalue"] > best:
                        best, where = (
                            x["combined_pvalue"],
                            os.path.basename(os.path.dirname(f_)),
                        )
        except Exception:
            pass
    return best, where


def best_of_workdir(runs):
    """(best combined p, provenance) across every run dir of a candidate;
    provenance carries the run-dir basename so continuation evidence stays
    attributable."""
    best, where = 0.0, ""
    for run in runs:
        b, w = best_of_run(run)
        if b > best:
            best, where = b, f"{os.path.basename(run)}: {w}"
    return best, where


def archive():
    """Copy evidence files; returns (n_runs_archived, global_best, rows).

    Each scored run dir archives into its own stamped folder
    ``<workdir>@<run-basename>/`` so a continued candidate's runs never mix
    draws (two levels deep — still visible to results_report.py's
    ``*/*/ks_summary.json`` glob)."""
    rows = []
    n = 0
    for wd, runs in chase_runs():
        name = os.path.basename(wd)
        best, where = best_of_workdir(runs)
        rows.append({"workdir": name, "runs": runs, "best": best,
                     "where": where})
        for run in runs:
            if not os.path.exists(os.path.join(run, "ks_summary.json")):
                continue  # unscored run: nothing judge-relevant yet
            dst = os.path.join(OUT_ROOT, f"{name}@{os.path.basename(run)}")
            os.makedirs(dst, exist_ok=True)
            for fname in ("ks_summary.json", "ks_results.csv",
                          "ks_results.png", "config.yaml",
                          "training_args.json"):
                src = os.path.join(run, fname)
                if os.path.exists(src):
                    shutil.copy2(src, os.path.join(dst, fname))
            for f_ in glob.glob(os.path.join(run, "draws*_ckpt*",
                                             "self_feed_draws.json")):
                tag = os.path.basename(os.path.dirname(f_))  # draws_ckpt640
                shutil.copy2(f_, os.path.join(dst, f"{tag}.json"))
            n += 1
    if rows:
        gbest = max(rows, key=lambda r: r["best"])
    else:
        gbest = None
    if n:
        os.makedirs(OUT_ROOT, exist_ok=True)
        with open(os.path.join(OUT_ROOT, "README.md"), "w") as f:
            f.write(
                "# GT matched-10M chase — archived evidence\n\n"
                "10M-budget Graph Transformer candidates vs the reference's "
                f"10M row (combined KS p {REF_P} @ ckpt 870, "
                "`figures/combined_pvalues_summary.csv:7`).  Produced by the "
                "probe-gated queues in `scripts/queues/`; each folder is one "
                "scored run dir of a candidate (`<candidate>@<run-stamp>` — "
                "continued candidates have several), holding the in-run "
                "`ks_summary.json` on the published six-macro basis + "
                "12-draw self-feed batteries at its top checkpoints.\n\n"
                "| candidate | best combined p | from |\n|---|---|---|\n"
            )
            for r in sorted(rows, key=lambda r: -r["best"]):
                f.write(f"| {r['workdir']} | {r['best']:.3g} | {r['where'] or '—'} |\n")
            if gbest:
                verdict = (
                    "BEATS" if gbest["best"] >= REF_P else "does not yet beat"
                )
                f.write(
                    f"\nGlobal best: **{gbest['best']:.3g}** "
                    f"({gbest['workdir']}, {gbest['where']}) — {verdict} the "
                    f"reference row ({REF_P}).\n"
                )
    return n, (gbest["best"] if gbest else 0.0), rows


def main():
    if "--check" in sys.argv:
        rows = [
            {"workdir": os.path.basename(wd), "best": best_of_workdir(runs)[0]}
            for wd, runs in chase_runs()
        ]
        best = max((r["best"] for r in rows), default=0.0)
        print(json.dumps({"global_best": best, "beats_ref": best >= REF_P,
                          "candidates": rows}))
        return
    n, best, rows = archive()
    print(
        f"archived {n} scored run(s); global best {best:.3g} "
        f"({'BEATS' if best >= REF_P else 'below'} reference {REF_P})"
    )


if __name__ == "__main__":
    main()
