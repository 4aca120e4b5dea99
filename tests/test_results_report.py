"""scripts/results_report.py: the committed docs/results archives must
regenerate the multi-model summary (reference analogue:
``figures/combined_pvalues_summary.csv``)."""

import csv
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import results_report


def test_collect_on_committed_archives():
    rows, series = results_report.collect(os.path.join(REPO, "docs", "results"))
    assert len(rows) >= 10  # the archived real-TPU run set
    models = {r["model"] for r in rows}
    # every reference-scoreboard family (+ our beyond-reference rows) present
    assert {"ponita", "segnn", "graph_transformer", "cgenn",
            "equiformer_v2", "egnn_mc", "painn"} <= models
    for r in rows:
        assert r["best_combined_pvalue"] == r["best_combined_pvalue"]  # not NaN
    assert series  # overlay has at least one curve


def test_main_writes_csv_and_handles_draws(tmp_path):
    run = tmp_path / "toy_v5e"
    run.mkdir()
    (run / "ks_summary.json").write_text(json.dumps({
        "run_path": "/tmp/x/runs/egnn_mc/2026-01-01_00-00-00__toy",
        "num_checkpoints": 2,
        "best_checkpoint": 20,
        "best_combined_pvalue": 1e-4,
        "first_checkpoint_p_ge_0.05": None,
        "results": [
            {"checkpoint": 10, "combined_pvalue": 1e-6},
            {"checkpoint": 20, "combined_pvalue": 1e-4},
        ],
    }))
    # a second-battery archive must not corrupt the checkpoint id (naive
    # all-digits parsing would read draws2_ckpt20 as checkpoint 220)
    (run / "draws2_ckpt20.json").write_text(json.dumps({
        "best_combined_pvalue": 0.02,
        "draws": [{"combined_pvalue": 0.02}, {"combined_pvalue": 1e-3}],
    }))
    rc = results_report.main(["--results-dir", str(tmp_path), "--no-plot"])
    assert rc == 0
    rows = list(csv.DictReader(open(tmp_path / "combined_pvalues_summary.csv")))
    assert len(rows) == 1
    r = rows[0]
    assert r["model"] == "egnn_mc"
    assert float(r["best_draw_pvalue"]) == 0.02
    assert r["best_draw_checkpoint"] == "20"
    # draw battery beats the in-run series -> overall picks it
    assert float(r["best_overall_pvalue"]) == 0.02


def test_collect_includes_nested_chase_archives(tmp_path):
    """gt_10m_chase/<workdir>/ks_summary.json (two levels deep) must appear
    in the 'every archived run' report."""
    nested = tmp_path / "gt_10m_chase" / "gt_10m_deep"
    nested.mkdir(parents=True)
    (nested / "ks_summary.json").write_text(json.dumps({
        "run_path": "/tmp/gt_10m_deep/runs/graph_transformer/x__gt10m_deep",
        "num_checkpoints": 1,
        "best_checkpoint": 10,
        "best_combined_pvalue": 5e-3,
        "results": [{"checkpoint": 10, "combined_pvalue": 5e-3}],
    }))
    rows, series = results_report.collect(str(tmp_path))
    assert len(rows) == 1
    assert rows[0]["folder"] == os.path.join("gt_10m_chase", "gt_10m_deep")
    assert rows[0]["model"] == "graph_transformer"


def test_main_errors_on_empty_dir(tmp_path):
    assert results_report.main(["--results-dir", str(tmp_path)]) == 1


def test_superseded_rows_flagged_and_excluded_from_plot(tmp_path):
    """Historical rows carry superseded_by (from their README marker) and
    drop out of the plot series; current rows don't (round-2 VERDICT #7)."""
    for name, readme in [
        ("old_v5e", "# old\n\nsuperseded-by: new_v5e — pre-fix run\n"),
        ("new_v5e", "# new\n"),
    ]:
        d = tmp_path / name
        d.mkdir()
        (d / "README.md").write_text(readme)
        (d / "ks_summary.json").write_text(json.dumps({
            "run_path": "/tmp/x/runs/egnn_mc/2026-01-01_00-00-00__t",
            "num_checkpoints": 1, "best_checkpoint": 10,
            "best_combined_pvalue": 1e-4,
            "first_checkpoint_p_ge_0.05": None,
            "results": [{"checkpoint": 10, "combined_pvalue": 1e-4}],
        }))
    rows, series = results_report.collect(str(tmp_path))
    by_folder = {r["folder"]: r for r in rows}
    assert by_folder["old_v5e"]["superseded_by"] == "new_v5e"
    assert by_folder["new_v5e"]["superseded_by"] == ""
    assert list(series) == ["egnn_mc (new_v5e)"]


def test_committed_archives_mark_known_stale_rows():
    rows, _ = results_report.collect(os.path.join(REPO, "docs", "results"))
    by_folder = {r["folder"]: r for r in rows}
    # the three pre-fix rows round-2's VERDICT called out
    assert by_folder["equiformer_v2_v5e"]["superseded_by"] == "equiformer_v2_s7_v5e"
    assert by_folder["ponita_v5e_400ep"]["superseded_by"] == "ponita_v5e_800ep"
    assert by_folder["cgenn_v5e_rerun"]["superseded_by"] == "cgenn_harden_A"
    # and their successors are current
    for cur in ("equiformer_v2_s7_v5e", "ponita_v5e_800ep", "cgenn_harden_A"):
        assert by_folder[cur]["superseded_by"] == ""
