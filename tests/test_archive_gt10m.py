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


def _mk_run(tmp_path, name, ks_best, draw_best=None, scored=True,
            stamp="2026-08-18_00-00-00"):
    run = tmp_path / name / "runs" / "graph_transformer" / stamp
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
    stamp = "2026-08-18_00-00-00"
    assert (out / f"gt_10m_deep@{stamp}" / "ks_summary.json").exists()
    assert (out / f"gt_10m_deep@{stamp}" / "draws_ckpt640.json").exists()
    assert (out / f"gt_10m_deep6@{stamp}" / "ks_results.csv").exists()
    readme = (out / "README.md").read_text()
    assert "0.008" in readme and "BEATS" in readme  # 8e-3 >= 6.9e-3


def test_unscored_runs_counted_but_not_archived(archiver, tmp_path):
    _mk_run(tmp_path, "gt_10m_deep", ks_best=0.0, scored=False)
    n, best, rows = archiver.archive()
    assert n == 0 and rows and rows[0]["best"] == 0.0
    assert not list((tmp_path / "out").glob("gt_10m_deep*"))


def test_continuation_best_in_ancestor_run_dir(archiver, tmp_path):
    """A resumed candidate's best evidence can live in an OLDER run dir —
    the aggregate best and the archive must cover every run dir, and the
    two runs' draws must land in separate stamped folders."""
    import os as _os
    import time as _time

    old = _mk_run(tmp_path, "gt_10m_deep", ks_best=1e-4, draw_best=8e-3,
                  stamp="2026-08-18_00-00-00")
    new = _mk_run(tmp_path, "gt_10m_deep", ks_best=2e-5, draw_best=1e-5,
                  stamp="2026-08-19_01-00-00")
    # getmtime ordering: the continuation run dir is newer
    past = _time.time() - 1000
    _os.utime(old, (past, past))
    wd, runs = archiver.chase_runs()[0]
    assert [r.rsplit("/", 1)[-1] for r in runs] == [
        "2026-08-18_00-00-00", "2026-08-19_01-00-00"]
    best, where = archiver.best_of_workdir([str(old), str(new)])
    assert best == 8e-3 and where.startswith("2026-08-18_00-00-00:")
    n, gbest, rows = archiver.archive()
    assert n == 2 and gbest == 8e-3
    out = tmp_path / "out"
    assert (out / "gt_10m_deep@2026-08-18_00-00-00" /
            "draws_ckpt640.json").exists()
    assert (out / "gt_10m_deep@2026-08-19_01-00-00" /
            "draws_ckpt640.json").exists()
    # --check aggregation sees the ancestor's best (chase-met detection)
    assert rows[0]["best"] == 8e-3


def test_idempotent_rearchive(archiver, tmp_path):
    _mk_run(tmp_path, "gt_10m_deep", ks_best=1e-3)
    n1, _, _ = archiver.archive()
    n2, _, _ = archiver.archive()
    assert n1 == n2 == 1
    assert len(list((tmp_path / "out").glob("gt_10m_deep*"))) == 1
