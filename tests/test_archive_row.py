"""archive_row.py flattens a pipeline workdir into a docs/results row."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_run(wd, name, ck_p, draw_p):
    rd = wd / "runs" / "egnn_mc" / name
    rd.mkdir(parents=True)
    (rd / "ks_summary.json").write_text(json.dumps(
        {"results": [{"checkpoint": 50, "combined_pvalue": ck_p}]}))
    d = rd / "draws_ckpt50"
    d.mkdir()
    (d / "self_feed_draws.json").write_text(json.dumps(
        {"best_combined_pvalue": draw_p, "draws": []}))
    d2 = rd / "draws2_ckpt50"
    d2.mkdir()
    (d2 / "self_feed_draws.json").write_text(json.dumps(
        {"best_combined_pvalue": draw_p / 2, "draws": []}))
    return rd


def test_archive_row_flattens_and_reports(tmp_path):
    wd = tmp_path / "wd"
    _mk_run(wd, "2026-01-01_00-00-00__a", 1e-4, 3e-3)
    results = tmp_path / "results"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "archive_row.py"),
         "--workdir", str(wd), "--dest", "rowz",
         "--results-dir", str(results), "--note", "test row"],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    payload = json.loads(r.stdout)
    dest = results / "rowz"
    assert (dest / "ks_summary.json").exists()
    assert (dest / "draws_ckpt50.json").exists()
    assert (dest / "draws2_ckpt50.json").exists()
    assert payload["best_battery_p"] == 3e-3
    assert payload["best_in_run_ckpt"] == "50"
    readme = (dest / "README.md").read_text()
    assert "test row" in readme and "0.003" in readme

    # a second source run dir must be suffixed, not clobbered
    _mk_run(wd, "2026-01-02_00-00-00__b", 2e-3, 9e-3)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "archive_row.py"),
         "--workdir", str(wd), "--dest", "rowz",
         "--results-dir", str(results)],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    assert (dest / "ks_summary_0.json").exists()
    assert (dest / "ks_summary_1.json").exists()
    assert json.loads(r.stdout)["best_battery_p"] == 9e-3


def test_archive_row_keeps_headline_ckpt(tmp_path):
    """The headline checkpoint's params must land in the archive (round-3
    postmortem: runs/ is wiped on hand-offs, so un-archived checkpoints made
    second-seed replication batteries impossible for three 10M rows)."""
    wd = tmp_path / "wd"
    rd = _mk_run(wd, "2026-01-01_00-00-00__a", 1e-4, 3e-3)
    ck = rd / "checkpoints" / "50"
    ck.mkdir(parents=True)
    (ck / "model.ckpt").write_bytes(b"params-bytes")
    results = tmp_path / "results"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "archive_row.py"),
         "--workdir", str(wd), "--dest", "rowk",
         "--results-dir", str(results)],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    payload = json.loads(r.stdout)
    kept = results / "rowk" / "ckpt_50_model.ckpt"
    assert kept.exists() and kept.read_bytes() == b"params-bytes"
    assert payload["kept_ckpt"] == str(kept)
    assert "ckpt_50_model.ckpt" in (results / "rowk" / "README.md").read_text()

    # --no-keep-ckpt opts out
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "archive_row.py"),
         "--workdir", str(wd), "--dest", "rownk",
         "--results-dir", str(results), "--no-keep-ckpt"],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout)["kept_ckpt"] is None
    assert not (results / "rownk" / "ckpt_50_model.ckpt").exists()


def test_archive_row_keeps_ckpt_from_headline_run_dir(tmp_path):
    """Checkpoint numbers repeat across a workdir's run dirs (continuation
    runs re-count under save_model_every).  The kept params must come from
    the run dir that produced the headline battery, not simply the newest
    dir holding that number (ADVICE round-4 medium)."""
    wd = tmp_path / "wd"
    # older run dir wins the battery headline at ckpt 50
    rd_old = _mk_run(wd, "2026-01-01_00-00-00__a", 1e-4, 9e-3)
    ck = rd_old / "checkpoints" / "50"
    ck.mkdir(parents=True)
    (ck / "model.ckpt").write_bytes(b"headline-params")
    # newer run dir also has a checkpoint 50 (different trajectory)
    rd_new = _mk_run(wd, "2026-01-02_00-00-00__b", 1e-5, 1e-6)
    ck2 = rd_new / "checkpoints" / "50"
    ck2.mkdir(parents=True)
    (ck2 / "model.ckpt").write_bytes(b"other-params")
    results = tmp_path / "results"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "archive_row.py"),
         "--workdir", str(wd), "--dest", "rowh",
         "--results-dir", str(results)],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    kept = results / "rowh" / "ckpt_50_model.ckpt"
    assert kept.read_bytes() == b"headline-params"

    # when the headline dir lost its checkpoint, fall back with a warning
    (ck / "model.ckpt").unlink()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "archive_row.py"),
         "--workdir", str(wd), "--dest", "rowh2",
         "--results-dir", str(results)],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    assert (results / "rowh2" / "ckpt_50_model.ckpt").read_bytes() == \
        b"other-params"
    assert "WARNING" in r.stderr


def test_archive_row_empty_workdir_fails(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "archive_row.py"),
         "--workdir", str(tmp_path), "--dest", "roww",
         "--results-dir", str(tmp_path / "res")],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 1
