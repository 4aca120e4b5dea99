"""scripts/archive_gt10m.py: chase evidence must archive correctly from
scratch workdirs (in-run + draw-battery bests, README verdict, idempotence)."""

import importlib.util
import json
import os

import pytest


@pytest.fixture()
def archiver(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "archive_gt10m",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "archive_gt10m.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "WORKDIR_GLOBS", [str(tmp_path / "gt_10m_*")])
    monkeypatch.setattr(mod, "OUT_ROOT", str(tmp_path / "out"))
    return mod


def _mk_run(tmp_path, name, ks_best, draw_best=None, scored=True):
    run = tmp_path / name / "runs" / "graph_transformer" / "2026-08-18_00-00-00"
    run.mkdir(parents=True)
    if scored:
        summary = {
            "results": [
                {"checkpoint": 100, "combined_pvalue": ks_best / 2},
                {"checkpoint": 640, "combined_pvalue": ks_best},
            ]
        }
        (run / "ks_summary.json").write_text(json.dumps(summary))
        (run / "ks_results.csv").write_text("checkpoint,combined_pvalue\n")
        (run / "config.yaml").write_text("model_type: graph_transformer\n")
    if draw_best is not None:
        d = run / "draws_ckpt640"
        d.mkdir()
        (d / "self_feed_draws.json").write_text(
            json.dumps({"draws": [{"combined_pvalue": draw_best}]})
        )
    return run


def test_best_of_run_prefers_draws(archiver, tmp_path):
    run = _mk_run(tmp_path, "gt_10m_deep", ks_best=1e-4, draw_best=8e-3)
    best, where = archiver.best_of_run(str(run))
    assert best == 8e-3 and where == "draws_ckpt640"


def test_archive_copies_evidence_and_writes_readme(archiver, tmp_path):
    _mk_run(tmp_path, "gt_10m_deep", ks_best=1e-4, draw_best=8e-3)
    _mk_run(tmp_path, "gt_10m_deep6", ks_best=2e-5)
    n, best, rows = archiver.archive()
    assert n == 2 and best == 8e-3
    out = tmp_path / "out"
    assert (out / "gt_10m_deep" / "ks_summary.json").exists()
    assert (out / "gt_10m_deep" / "draws_ckpt640.json").exists()
    assert (out / "gt_10m_deep6" / "ks_results.csv").exists()
    readme = (out / "README.md").read_text()
    assert "0.008" in readme and "BEATS" in readme  # 8e-3 >= 6.9e-3


def test_unscored_runs_counted_but_not_archived(archiver, tmp_path):
    _mk_run(tmp_path, "gt_10m_deep", ks_best=0.0, scored=False)
    n, best, rows = archiver.archive()
    assert n == 0 and rows and rows[0]["best"] == 0.0
    assert not (tmp_path / "out" / "gt_10m_deep").exists()


def test_idempotent_rearchive(archiver, tmp_path):
    _mk_run(tmp_path, "gt_10m_deep", ks_best=1e-3)
    n1, _, _ = archiver.archive()
    n2, _, _ = archiver.archive()
    assert n1 == n2 == 1
