"""Checkpoint KS ranking — port of ``ks_test/ks_test_model_checkpoints.py``.

Walks ``runs/<model>/<ts>/checkpoints/<int>/``, re-computes per-macro KS
p-values from the stored macro JSONs (GT vs predicted), Fisher-combines them
per checkpoint, derives the GT-vs-GT baseline noise floor, and reports the
best checkpoint.  Output artifacts: ``ks_results.csv``, ``ks_results.png``
(combined + per-macro p-value curves) and a JSON summary, written into the
run dir.

Also exposes :func:`combined_pvalues_report` which aggregates many runs into
a ``combined_pvalues_summary.csv`` like ``figures/combined_pvalues_summary
.csv`` (model, best checkpoint, best combined p, first checkpoint with
p >= 0.05 — the table reproduced in BASELINE.md).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..metrics import artifacts
from ..metrics.ks import SCORED_MACROS, fisher_combine, ks_p

ENERGY_KEYS = ["energy_total", "energy_potential", "energy_kinetic"]


def load_checkpoint_pvalues(
    ckpt_dir: str, include_energy: bool = True
) -> Tuple[Dict[str, float], float]:
    """Per-macro (+ optionally energy) p-values and their Fisher combination
    for one checkpoint dir.

    ``include_energy=True`` is the HPO-objective semantics
    (``utils/hpo_metrics.py:61-105``: any energy p > 0 joins the combine —
    note the perverse edge that a *worse* energy series underflowing to an
    exact 0.0 is excluded while a clamped 1e-300 is included).
    ``include_energy=False`` is the published-scoreboard semantics: the
    reference's ``ks_test/ks_test_model_checkpoints.py:38-49`` combines the
    six macro files only, and its figures/BASELINE numbers come from that
    path.  The energy p-values are still reported in ``per`` either way.
    """
    per: Dict[str, float] = {}
    pvals: List[float] = []
    data = artifacts.read_macro_jsons(ckpt_dir)
    for key in SCORED_MACROS:
        if key not in data:
            per[key] = float("nan")
            continue
        p = ks_p(data[key]["ground truth"], data[key]["predicted"])
        per[key] = p
        if p == p and p > 0.0:
            pvals.append(p)
    # first-party extension macro: scored in place of the NaN-gated group
    # macro above the N gate, recorded-only otherwise (metrics/ks.py rule)
    if "stuck_cluster_size" in data:
        p_ext = ks_p(data["stuck_cluster_size"]["ground truth"],
                     data["stuck_cluster_size"]["predicted"])
        per["stuck_cluster_size"] = p_ext
        group = per.get("group_collision_count", float("nan"))
        if group != group and p_ext == p_ext and p_ext > 0.0:
            pvals.append(p_ext)
    energy_path = os.path.join(ckpt_dir, "nbody_macro_metrics.json")
    if os.path.exists(energy_path):
        try:
            with open(energy_path) as f:
                m = json.load(f)
            for key in ENERGY_KEYS:
                p = float(m.get("ks_pvalues", {}).get(key, float("nan")))
                per[key] = p
                if include_energy and p == p and p > 0.0:
                    pvals.append(p)
        except Exception:
            pass
    return per, fisher_combine(pvals)


def gt_baseline_pvalues(
    dataset, n_pairs: int = 5, batch_size: Optional[int] = None
) -> List[float]:
    """GT-vs-GT combined p-values: the macro noise floor
    (``ks_test_model_checkpoints.py:171-188``).  Each sample compares the
    macros of two *independent* fresh trajectory batches."""
    from ..metrics import macros as M
    from ..metrics.ks import macro_ks_pvalues

    out = []
    for _ in range(n_pairs):
        loc1, vel1, *_ = dataset.get_ground_truth_trajectories(batch_size)
        loc2, vel2, *_ = dataset.get_ground_truth_trajectories(batch_size)
        g1 = M.compute_all_macros(np.asarray(loc1), np.asarray(vel1))
        g2 = M.compute_all_macros(np.asarray(loc2), np.asarray(vel2))
        _, combined = macro_ks_pvalues(g1, g2)
        out.append(combined)
    return out


def evaluate_run_checkpoints(
    run_path: str,
    baseline_dataset=None,
    plot: bool = True,
) -> Dict:
    """Rank all checkpoints of a run dir; write csv/png/summary.

    Returns a dict with per-checkpoint results and the best checkpoint
    (``ks_test_model_checkpoints.py:320-434``)."""
    ckpt_root = os.path.join(run_path, "checkpoints")
    if not os.path.isdir(ckpt_root):
        raise FileNotFoundError(f"no checkpoints/ under {run_path}")
    steps = sorted((d for d in os.listdir(ckpt_root) if d.isdigit()), key=int)

    rows = []
    per_macro_series: Dict[str, List[float]] = {}
    for step in steps:
        # published-scoreboard semantics: macros only (reference ks_test)
        per, combined = load_checkpoint_pvalues(
            os.path.join(ckpt_root, step), include_energy=False
        )
        rows.append({"checkpoint": int(step), "combined_pvalue": combined, **per})

    # build equal-length per-metric series (a checkpoint dir may be missing
    # some artifacts, e.g. a run killed mid-eval): pad absent keys with NaN
    all_keys = sorted({k for r in rows for k in r if k not in ("checkpoint", "combined_pvalue")})
    for k in all_keys:
        per_macro_series[k] = [r.get(k, float("nan")) for r in rows]

    valid = [r for r in rows if r["combined_pvalue"] == r["combined_pvalue"]]
    best = max(valid, key=lambda r: r["combined_pvalue"]) if valid else None
    first_sig = next(
        (r["checkpoint"] for r in valid if r["combined_pvalue"] >= 0.05), None
    )

    baseline = None
    if baseline_dataset is not None:
        baseline = gt_baseline_pvalues(baseline_dataset)

    # csv
    import csv

    csv_path = os.path.join(run_path, "ks_results.csv")
    if rows:
        with open(csv_path, "w", newline="") as f:
            w = csv.DictWriter(
                f,
                fieldnames=["checkpoint", "combined_pvalue", *all_keys],
                restval="",
            )
            w.writeheader()
            w.writerows(rows)

    if plot and rows:
        from ..viz.macro_plots import plot_pvalue_series

        plot_pvalue_series(
            run_path,
            [r["checkpoint"] for r in rows],
            [r["combined_pvalue"] for r in rows],
            per_metric=per_macro_series,
            filename="ks_results.png",
        )

    summary = {
        "run_path": run_path,
        "num_checkpoints": len(rows),
        "best_checkpoint": best["checkpoint"] if best else None,
        "best_combined_pvalue": best["combined_pvalue"] if best else None,
        "first_checkpoint_p_ge_0.05": first_sig,
        "gt_baseline_pvalues": baseline,
        "results": rows,
    }
    with open(os.path.join(run_path, "ks_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def combined_pvalues_report(
    run_paths: List[str], out_csv: str, plot: bool = True
) -> List[Dict]:
    """Aggregate best-checkpoint stats across runs
    (``ks_test/plot_combined_pvalues_multi_model.py`` summary csv), plus the
    multi-model combined-p-vs-checkpoint overlay figure
    (``figures/combined_pvalues_*_multi.png``)."""
    import csv

    rows = []
    series = {}
    for rp in run_paths:
        try:
            s = evaluate_run_checkpoints(rp, plot=False)
        except FileNotFoundError:
            continue
        model = os.path.basename(os.path.dirname(os.path.normpath(rp)))
        series[f"{model} ({os.path.basename(os.path.normpath(rp))})"] = s["results"]
        rows.append(
            {
                "model": model,
                "run": rp,
                "best_checkpoint": s["best_checkpoint"],
                "best_combined_pvalue": s["best_combined_pvalue"],
                "first_checkpoint_p_ge_0.05": s["first_checkpoint_p_ge_0.05"],
            }
        )
    if plot and series:
        _plot_multi_model(series, os.path.splitext(out_csv)[0] + "_multi.png")
    os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(
            f,
            fieldnames=[
                "model",
                "run",
                "best_checkpoint",
                "best_combined_pvalue",
                "first_checkpoint_p_ge_0.05",
            ],
        )
        w.writeheader()
        w.writerows(rows)
    return rows


def _plot_multi_model(series: Dict[str, List[Dict]], out_png: str) -> None:
    """Overlayed combined-p curves, one per run, log y
    (``plot_combined_pvalues_multi_model.py`` figure)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(11, 6))
    for label, rows in series.items():
        xs = [r["checkpoint"] for r in rows]
        ys = [max(r["combined_pvalue"], 1e-300) for r in rows]
        ax.plot(xs, ys, "o-", ms=3, label=label)
    ax.axhline(0.05, color="red", ls="--", lw=0.8, label="p = 0.05")
    ax.set_yscale("log")
    ax.set_xlabel("checkpoint")
    ax.set_ylabel("Fisher-combined p")
    ax.legend(fontsize=7)
    fig.tight_layout()
    d = os.path.dirname(os.path.abspath(out_png))
    os.makedirs(d, exist_ok=True)
    fig.savefig(out_png)
    plt.close(fig)


def time_cutoff_report(
    run_paths: List[str], hours: float = 8.0, out_json: Optional[str] = None
) -> Dict[str, int]:
    """Max checkpoint reached within a wall-clock budget per run — the
    throughput record of ``ks_test/run_8h_cutoffs.json`` (BASELINE.md
    derives train steps/s from it).  Uses the ``_time`` stamps in each
    run's ``metrics.jsonl``."""
    out: Dict[str, int] = {}
    for rp in run_paths:
        path = os.path.join(rp, "metrics.jsonl")
        if not os.path.exists(path):
            continue
        records = [json.loads(l) for l in open(path) if l.strip()]
        times = [r["_time"] for r in records if "_time" in r]
        if not times:  # run crashed before its first epoch log
            continue
        t0 = min(times)
        best = 0
        for r in records:
            if "self_feed/step" in r and r["_time"] - t0 <= hours * 3600:
                best = max(best, int(r["self_feed/step"]) + 1)
        out[rp] = best
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"hours": hours, "max_checkpoint": out}, f, indent=2)
    return out


def main(argv=None):  # pragma: no cover - thin CLI
    import argparse

    from ..data.gravity_otf import GravityDatasetOtf

    p = argparse.ArgumentParser(description="KS-rank a run's checkpoints")
    p.add_argument("run_path", nargs="+")
    p.add_argument("--baseline", action="store_true", help="compute GT-GT floor")
    p.add_argument(
        "--multi-out",
        default=None,
        help="aggregate several runs into this summary csv "
        "(plot_combined_pvalues_multi_model equivalent)",
    )
    p.add_argument(
        "--hours", type=float, default=None,
        help="also report max checkpoint within this wall-clock budget",
    )
    args = p.parse_args(argv)

    if len(args.run_path) > 1 or args.multi_out:
        out_csv = args.multi_out or "combined_pvalues_summary.csv"
        rows = combined_pvalues_report(args.run_path, out_csv)
        for r in rows:
            # a run whose checkpoints all lack macro JSONs has no valid
            # combined p (best is None) — report it instead of crashing
            bp = r["best_combined_pvalue"]
            ptxt = f"{bp:.3g}" if bp is not None else "n/a (no scored checkpoints)"
            print(
                f"{r['model']}: best ckpt {r['best_checkpoint']} "
                f"p={ptxt} "
                f"first p>=0.05: {r['first_checkpoint_p_ge_0.05']}"
            )
        if args.hours:
            cuts = time_cutoff_report(args.run_path, hours=args.hours)
            for rp, ck in cuts.items():
                print(f"{rp}: max checkpoint in {args.hours}h = {ck}")
        print(f"summary csv: {out_csv}")
        return

    args.run_path = args.run_path[0]
    ds = None
    if args.baseline:
        meta_files = [
            os.path.join(args.run_path, d, "metadata.json")
            for d in os.listdir(args.run_path)
            if d.endswith("_dataset")
        ]
        if meta_files and os.path.exists(meta_files[0]):
            with open(meta_files[0]) as f:
                ds = GravityDatasetOtf.from_metadata(json.load(f), cache_data=False)
    s = evaluate_run_checkpoints(args.run_path, baseline_dataset=ds)
    print(
        f"best checkpoint: {s['best_checkpoint']} "
        f"(combined p = {s['best_combined_pvalue']})"
    )
    if args.hours:
        cuts = time_cutoff_report([args.run_path], hours=args.hours)
        for rp, ck in cuts.items():
            print(f"{rp}: max checkpoint in {args.hours}h = {ck}")


if __name__ == "__main__":  # pragma: no cover
    main()
