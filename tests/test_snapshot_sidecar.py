"""Hand-off-safety sidecar (scripts/queues/snapshot_sidecar.sh).

Guards the recovery contract that keeps long chip runs resumable across
builder-machine hand-offs (runs/ is gitignored and wiped): `seed` must
plant the committed partial exactly where pipeline.continuation_ckpt()
looks, and `watch` must mirror the newest trainer snapshot back into the
archive directory.  No reference counterpart (reference has no preemptible
-host story); this is our queue infrastructure.
"""
import os
import subprocess
import time

SIDECAR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "queues", "snapshot_sidecar.sh",
)


def _run(args, repo, **kw):
    env = dict(os.environ, SIDECAR_REPO=str(repo))
    return subprocess.run(
        ["bash", SIDECAR, *[str(a) for a in args]],
        env=env, capture_output=True, text=True, timeout=60, **kw,
    )


def _fake_repo(tmp_path, tag, with_seed=True):
    repo = tmp_path / "repo"
    (repo / "docs" / "results").mkdir(parents=True)
    subprocess.run(["git", "init", "-q", str(repo)], check=True)
    subprocess.run(["git", "-C", str(repo), "config", "user.email", "t@t"],
                   check=True)
    subprocess.run(["git", "-C", str(repo), "config", "user.name", "t"],
                   check=True)
    if with_seed:
        part = repo / "docs" / "results" / f"{tag}_partial"
        part.mkdir()
        (part / "model.ckpt").write_bytes(b"archived-epoch-23")
    return repo


def test_seed_plants_resumable_ckpt(tmp_path):
    repo = _fake_repo(tmp_path, "rowx")
    wd = tmp_path / "wd"
    wd.mkdir()
    r = _run(["seed", wd, "egnn_mc", "rowx"], repo)
    assert r.returncode == 0 and "seeded" in r.stdout
    # exactly the layout continuation_ckpt() globs: runs/<model>/<dir>/model.ckpt
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(SIDECAR), os.pardir))
    from pipeline import continuation_ckpt
    ck = continuation_ckpt(str(wd))
    assert ck is not None and ck.endswith("model.ckpt")
    with open(ck, "rb") as f:
        assert f.read() == b"archived-epoch-23"


def test_seed_noop_without_archive_or_with_existing_runs(tmp_path):
    repo = _fake_repo(tmp_path, "rowy", with_seed=False)
    wd = tmp_path / "wd"
    wd.mkdir()
    r = _run(["seed", wd, "egnn_mc", "rowy"], repo)
    assert r.returncode == 0 and "no seed" in r.stdout
    assert not (wd / "runs").exists()
    # existing run => never overwrite
    repo2 = _fake_repo(tmp_path / "b", "rowy")
    live = wd / "runs" / "egnn_mc" / "live_run"
    live.mkdir(parents=True)
    (live / "model.ckpt").write_bytes(b"live")
    r = _run(["seed", wd, "egnn_mc", "rowy"], repo2)
    assert "no seed" in r.stdout
    assert (live / "model.ckpt").read_bytes() == b"live"


def test_watch_archives_and_commits_then_stops(tmp_path):
    repo = _fake_repo(tmp_path, "roww", with_seed=False)
    wd = tmp_path / "wd"
    run = wd / "runs" / "egnn_mc" / "r1"
    run.mkdir(parents=True)
    (run / "model.ckpt").write_bytes(b"epoch-50")
    (run / "ks_summary.json").write_text("{}")
    deadline = int(time.time()) + 30
    proc = subprocess.Popen(
        ["bash", SIDECAR, "watch", str(wd), "roww", "1", str(deadline)],
        env=dict(os.environ, SIDECAR_REPO=str(repo)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    dest = repo / "docs" / "results" / "roww_partial"
    for _ in range(200):
        if (dest / "model.ckpt").exists():
            break
        time.sleep(0.1)
    (wd / ".sidecar_stop").touch()
    out, _ = proc.communicate(timeout=30)
    assert (dest / "model.ckpt").read_bytes() == b"epoch-50"
    assert (dest / "ks_summary.json").exists()
    assert (dest / "snapshot.json").exists()
    log = subprocess.run(["git", "-C", str(repo), "log", "--oneline"],
                         capture_output=True, text=True).stdout
    assert "partial snapshot: roww" in log
    assert "done (roww)" in out
