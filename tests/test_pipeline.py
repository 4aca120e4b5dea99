"""Pipeline runner (scripts/pipeline.py) — resilient train->score->draws
orchestration.  The reference drives this by hand (README command sequence,
``README.md:27-39``); here it is a tested CLI with idempotent stages."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import pipeline  # noqa: E402


def _mk_run(workdir, n_ckpts=3, stamp="20260101", with_ckpt_files=True):
    run = os.path.join(workdir, "runs", "graph_transformer", stamp)
    for i in range(1, n_ckpts + 1):
        ck = os.path.join(run, "checkpoints", str(i * 10))
        os.makedirs(ck, exist_ok=True)
        if with_ckpt_files:
            open(os.path.join(ck, "model.ckpt"), "w").write("x")
    return run


def _mk_summary(run, pvals):
    results = [{"checkpoint": ck, "combined_pvalue": p} for ck, p in pvals.items()]
    with open(os.path.join(run, "ks_summary.json"), "w") as fh:
        json.dump({"results": results}, fh)


def _args(workdir, **kw):
    argv = ["--workdir", workdir, "--model", "graph_transformer",
            "--epochs", "5", "--min-checkpoints", "2",
            "--deadline-hours", "0.001", "--poll-s", "0.01"]
    for k, v in kw.items():
        argv += [f"--{k.replace('_', '-')}", str(v)]
    return pipeline.build_parser().parse_args(argv)


def test_latest_run_and_usable(tmp_path):
    wd = str(tmp_path)
    assert pipeline.latest_run(wd) is None
    run = _mk_run(wd, n_ckpts=3)
    assert pipeline.latest_run(wd) == run
    assert pipeline.run_usable(run, min_checkpoints=2)
    assert not pipeline.run_usable(run, min_checkpoints=5)
    assert not pipeline.run_usable(None, 1)


def test_ensure_run_reuses_existing(tmp_path):
    wd = str(tmp_path)
    run = _mk_run(wd)
    calls = []
    got = pipeline.ensure_run(_args(wd), runner=lambda *a, **k: calls.append(a),
                              wait_fn=lambda **k: True)
    assert got == run and calls == []


def test_ensure_run_trains_until_usable(tmp_path):
    wd = str(tmp_path)
    state = {"attempt": 0}

    def runner(cmd, **kw):
        state["attempt"] += 1
        if state["attempt"] >= 2:  # first attempt "fails" (no run dir)
            _mk_run(wd)
        assert "--trainer.run_name" in cmd

    args = _args(wd)
    args.deadline_hours = 0.01  # enough for a couple of fast fake attempts
    got = pipeline.ensure_run(args, runner=runner, wait_fn=lambda **k: True)
    assert got is not None and state["attempt"] == 2
    # train logs land in the workdir
    assert os.path.exists(os.path.join(wd, "train_attempt1.log"))


def test_ensure_run_gives_up_when_backend_dead(tmp_path):
    wd = str(tmp_path)
    got = pipeline.ensure_run(_args(wd), runner=lambda *a, **k: None,
                              wait_fn=lambda **k: False)
    assert got is None


def test_score_run_idempotent(tmp_path):
    wd = str(tmp_path)
    run = _mk_run(wd)
    _mk_summary(run, {"10": 0.5})
    calls = []
    assert pipeline.score_run(run, runner=lambda *a, **k: calls.append(a))
    assert calls == []  # existing summary short-circuits

    os.remove(os.path.join(run, "ks_summary.json"))

    def scorer(cmd, env=None, **kw):
        assert env["JAX_PLATFORMS"] == "cpu"
        _mk_summary(run, {"10": 0.5})

    assert pipeline.score_run(run, runner=scorer)


def test_aggregate_top_checkpoints_ranked_and_filtered(tmp_path):
    wd = str(tmp_path)
    run = _mk_run(wd, n_ckpts=3)  # checkpoints 10, 20, 30
    _mk_summary(run, {"10": 0.1, "20": 0.9, "30": 0.5, "40": 1.0})  # 40 has no ckpt
    assert pipeline.aggregate_top_checkpoints([run], 2) == [(run, "20"), (run, "30")]
    assert pipeline.aggregate_top_checkpoints([run], 9) == [
        (run, "20"), (run, "30"), (run, "10")]


def test_draw_batteries_skip_existing(tmp_path):
    """Completed batteries (summary file present) are skipped; a PARTIAL
    battery dir (killed mid-draws, no self_feed_draws.json) re-runs."""
    wd = str(tmp_path)
    run = _mk_run(wd, n_ckpts=3)
    _mk_summary(run, {"10": 0.9, "20": 0.1, "30": 0.5})
    done = os.path.join(run, "draws_ckpt10")
    os.makedirs(done)
    with open(os.path.join(done, "self_feed_draws.json"), "w") as fh:
        json.dump({"draws": [{"combined_pvalue": 0.5}]}, fh)
    partial = os.path.join(run, "draws_ckpt30", "draw_00")
    os.makedirs(partial)  # no self_feed_draws.json -> must re-run
    launched = []
    args = _args(wd, top_k=3, draws=4)
    pipeline.draw_batteries_at(
        pipeline.aggregate_top_checkpoints([run], args.top_k), args,
        runner=lambda cmd, **k: launched.append(cmd),
        wait_fn=lambda **k: True)
    hit = " ".join(" ".join(c) for c in launched)
    assert len(launched) == 2
    assert "checkpoints/20/model.ckpt" in hit
    assert "checkpoints/30/model.ckpt" in hit
    assert "checkpoints/10/model.ckpt" not in hit


def test_best_combined_p(tmp_path):
    wd = str(tmp_path)
    run = _mk_run(wd)
    _mk_summary(run, {"10": 2e-3, "20": 5e-3})
    dd = os.path.join(run, "draws_ckpt20")
    os.makedirs(dd)
    with open(os.path.join(dd, "self_feed_draws.json"), "w") as fh:
        json.dump({"draws": [{"combined_pvalue": 1e-4},
                             {"combined_pvalue": 8e-3}]}, fh)
    best = pipeline.best_combined_p(wd)
    assert best["best_in_run"] == pytest.approx(5e-3)
    assert best["best_draw"] == pytest.approx(8e-3)
    assert best["best"] == pytest.approx(8e-3)


def test_main_end_to_end(tmp_path, capsys):
    wd = str(tmp_path)

    def runner(cmd, env=None, **kw):
        cmd = list(cmd)
        if any("train.py" in c for c in cmd):
            run = _mk_run(wd)
        elif any("ks_test.py" in c for c in cmd):
            _mk_summary(pipeline.latest_run(wd), {"10": 0.7})
        elif any("self_feed.py" in c for c in cmd):
            out = cmd[cmd.index("--out") + 1]
            os.makedirs(out, exist_ok=True)
            with open(os.path.join(out, "self_feed_draws.json"), "w") as fh:
                json.dump({"draws": [{"combined_pvalue": 0.8}]}, fh)

    rc = pipeline.main(["--workdir", wd, "--model", "graph_transformer",
                        "--epochs", "5", "--min-checkpoints", "2",
                        "--top-k", "1"],
                       runner=runner, wait_fn=lambda **k: True)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "ok"
    assert out["best"] == pytest.approx(0.8)


def _mk_partial(workdir, stamp, epochs, with_resume_ckpt=True, mtime=None):
    """A run dir holding checkpoint dirs for the given epochs + model.ckpt."""
    run = os.path.join(workdir, "runs", "graph_transformer", stamp)
    for e in epochs:
        ck = os.path.join(run, "checkpoints", str(e))
        os.makedirs(ck, exist_ok=True)
        open(os.path.join(ck, "model.ckpt"), "w").write("x")
    if with_resume_ckpt:
        open(os.path.join(run, "model.ckpt"), "w").write("x")
    if mtime is not None:
        os.utime(run, (mtime, mtime))
    return run


def test_total_epochs_and_continuation_ckpt(tmp_path):
    wd = str(tmp_path)
    assert pipeline.total_epochs_reached(wd) == 0
    assert pipeline.continuation_ckpt(wd) is None
    a = _mk_partial(wd, "a", [10, 20, 30], mtime=1000)
    b = _mk_partial(wd, "b", [40, 50], mtime=2000)
    assert pipeline.total_epochs_reached(wd) == 50
    assert pipeline.continuation_ckpt(wd) == os.path.join(b, "model.ckpt")
    assert pipeline.runs_with_checkpoints(wd) == [a, b]
    # newest run without a resume snapshot falls back to the older one
    os.remove(os.path.join(b, "model.ckpt"))
    assert pipeline.continuation_ckpt(wd) == os.path.join(a, "model.ckpt")


def test_ensure_run_resumes_from_partial_run(tmp_path):
    """A tunnel-killed run must be continued via --trainer.model_path, not
    retrained from scratch, and the epoch target counts across run dirs."""
    wd = str(tmp_path)
    cmds = []

    def runner(cmd, **kw):
        cmds.append(list(cmd))
        if len(cmds) == 1:  # first attempt dies early: partial run
            _mk_partial(wd, "a", [10, 20], mtime=1000)
        else:  # continuation reaches the target in a NEW run dir
            _mk_partial(wd, "b", [30, 40, 50], mtime=2000)

    args = _args(wd)
    args.epochs, args.min_checkpoints = 50, 99  # only the epoch path can finish
    args.deadline_hours = 0.01
    got = pipeline.ensure_run(args, runner=runner, wait_fn=lambda **k: True)
    assert got is not None and got.endswith("b")
    assert len(cmds) == 2
    assert "--trainer.model_path" not in cmds[0]
    i = cmds[1].index("--trainer.model_path")
    assert cmds[1][i + 1] == os.path.join(wd, "runs", "graph_transformer",
                                          "a", "model.ckpt")
    # resume goes against the ROOT config, not the run's round-tripped one
    assert cmds[1][cmds[1].index("--config") + 1] == args.config


def test_main_normalizes_relative_workdir(tmp_path, monkeypatch, capsys):
    """main() with a RELATIVE --workdir must hand the trainer an ABSOLUTE
    resume path: the trainer subprocess runs with cwd=workdir, so a
    workdir-relative model_path does not exist from in there and every
    resume attempt crashes (observed live 2026-08-19, runs/r2 queue38)."""
    monkeypatch.chdir(tmp_path)
    _mk_partial(str(tmp_path / "wd"), "a", [10, 20], mtime=1000)
    cmds = []

    def runner(cmd, env=None, **kw):
        cmd = list(cmd)
        cmds.append(cmd)
        if any("train.py" in c for c in cmd):
            _mk_partial(str(tmp_path / "wd"), "b", [30, 40, 50], mtime=2000)
        elif any("ks_test.py" in c for c in cmd):
            for rd in pipeline.runs_with_checkpoints(str(tmp_path / "wd")):
                _mk_summary(rd, {"10": 0.7})

    rc = pipeline.main(["--workdir", "wd", "--model", "graph_transformer",
                        "--epochs", "50", "--min-checkpoints", "99",
                        "--ckpt-interval", "10", "--top-k", "1",
                        "--skip-draws", "--deadline-hours", "0.01",
                        "--poll-s", "0.01"],
                       runner=runner, wait_fn=lambda **k: True)
    assert rc == 0
    train_cmd = next(c for c in cmds if any("train.py" in x for x in c))
    resume = train_cmd[train_cmd.index("--trainer.model_path") + 1]
    assert os.path.isabs(resume) and os.path.exists(resume)
    cfg = train_cmd[train_cmd.index("--config") + 1]
    assert os.path.isabs(cfg)


def test_target_reached_respects_ckpt_interval(tmp_path):
    wd = str(tmp_path)
    args = _args(wd)
    args.epochs, args.min_checkpoints = 55, 99
    _mk_partial(wd, "a", [10, 20, 30, 40, 50])
    # last checkpoint lands at 50 (the largest multiple of 10 <= 55)
    assert pipeline._target_reached(args)
    args.epochs = 60
    assert not pipeline._target_reached(args)


def test_aggregate_top_checkpoints_across_run_dirs(tmp_path):
    wd = str(tmp_path)
    a = _mk_partial(wd, "a", [10, 20], mtime=1000)
    b = _mk_partial(wd, "b", [30, 40], mtime=2000)
    _mk_summary(a, {"10": 0.3, "20": 0.9})
    _mk_summary(b, {"30": 0.5, "40": 0.1})
    got = pipeline.aggregate_top_checkpoints([a, b], 2)
    assert got == [(a, "20"), (b, "30")]


def test_main_scores_every_run_dir_and_draws_across(tmp_path, capsys):
    wd = str(tmp_path)
    a = _mk_partial(wd, "a", [10, 20], mtime=1000)
    b = _mk_partial(wd, "b", [30, 40, 50], mtime=2000)
    scored, drawn = [], []

    def runner(cmd, env=None, **kw):
        cmd = list(cmd)
        if any("ks_test.py" in c for c in cmd):
            run = cmd[-1]
            scored.append(run)
            _mk_summary(run, {"20": 0.8} if run == a else {"30": 0.6})
        elif any("self_feed.py" in c for c in cmd):
            run = cmd[cmd.index("--run_dir") + 1]
            out = cmd[cmd.index("--out") + 1]
            drawn.append((run, os.path.basename(out)))
            os.makedirs(out, exist_ok=True)
            with open(os.path.join(out, "self_feed_draws.json"), "w") as fh:
                json.dump({"draws": [{"combined_pvalue": 0.9}]}, fh)

    rc = pipeline.main(
        ["--workdir", wd, "--model", "graph_transformer", "--epochs", "50",
         "--min-checkpoints", "99", "--top-k", "2"],
        runner=runner, wait_fn=lambda **k: True)
    assert rc == 0
    assert sorted(scored) == sorted([a, b])  # every run dir scored
    # draws hit the best checkpoint of EACH dir (cross-dir aggregation)
    assert (a, "draws_ckpt20") in drawn and (b, "draws_ckpt30") in drawn
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["best"] == pytest.approx(0.9)


def test_partial_run_not_declared_done_by_count(tmp_path):
    """62 checkpoint dirs of a 900-epoch run must NOT satisfy the target
    even when they exceed --min-checkpoints (late-outage resume case)."""
    wd = str(tmp_path)
    _mk_partial(wd, "a", list(range(10, 621, 10)))  # epochs 10..620
    args = _args(wd)
    args.epochs, args.min_checkpoints = 900, 60
    assert not pipeline._target_reached(args)
    args.epochs = 620
    assert pipeline._target_reached(args)


def test_train_timeout_retries_with_resume(tmp_path):
    """--train-timeout-s expiry is a resumable event, not a crash."""
    import subprocess as sp
    wd = str(tmp_path)
    cmds = []

    def runner(cmd, **kw):
        cmds.append(list(cmd))
        if len(cmds) == 1:
            _mk_partial(wd, "a", [10, 20], mtime=1000)
            raise sp.TimeoutExpired(cmd, kw.get("timeout", 0))
        _mk_partial(wd, "b", [30, 40, 50], mtime=2000)

    args = _args(wd)
    args.epochs, args.min_checkpoints, args.deadline_hours = 50, 99, 0.01
    got = pipeline.ensure_run(args, runner=runner, wait_fn=lambda **k: True)
    assert got is not None and got.endswith("b")
    assert "--trainer.model_path" in cmds[1]


def test_no_progress_attempts_stop_and_accept_near_complete(tmp_path):
    """A run stuck one interval short of the target stops retrying after
    two no-progress attempts and is accepted as near-complete."""
    wd = str(tmp_path)
    _mk_partial(wd, "a", list(range(10, 891, 10)))  # epochs 10..890 of 900
    attempts = []
    args = _args(wd)
    args.epochs, args.min_checkpoints, args.deadline_hours = 900, 60, 0.05
    args.poll_s = 0.01
    got = pipeline.ensure_run(args, runner=lambda c, **k: attempts.append(c),
                              wait_fn=lambda **k: True)
    assert len(attempts) == 2  # stopped by the stall guard, not the deadline
    assert got is not None  # 890 >= 900 - ckpt_interval -> accepted


def test_resume_bumps_explicit_dataloader_seed(tmp_path):
    """A seeded continuation must not replay the epochs it already ate."""
    wd = str(tmp_path)
    _mk_partial(wd, "a", [10, 20, 30])  # 30 epochs consumed
    args = _args(wd)
    args.override = ["trainer.seed=7", "dataloader.seed=7"]
    cmd = pipeline._train_cmd(args, model_path=os.path.join(wd, "x.ckpt"))
    assert cmd[cmd.index("--dataloader.seed") + 1] == "37"  # 7 + 30
    assert cmd[cmd.index("--trainer.seed") + 1] == "7"  # untouched
    # fresh starts keep the seed verbatim
    cmd = pipeline._train_cmd(args, model_path=None)
    assert cmd[cmd.index("--dataloader.seed") + 1] == "7"


def test_continuation_ckpt_covers_checkpointless_crash(tmp_path):
    """A run killed before its first checkpoint dir still resumes from its
    crash snapshot."""
    wd = str(tmp_path)
    a = _mk_partial(wd, "a", [10], mtime=1000)
    b = os.path.join(wd, "runs", "graph_transformer", "b")
    os.makedirs(b)
    open(os.path.join(b, "model.ckpt"), "w").write("x")
    os.utime(b, (2000, 2000))
    assert pipeline.continuation_ckpt(wd) == os.path.join(b, "model.ckpt")
    assert pipeline.runs_with_checkpoints(wd) == [a]  # b has no checkpoints


def test_second_battery_targets_global_best(tmp_path, capsys):
    wd = str(tmp_path)
    a = _mk_partial(wd, "a", [10, 20], mtime=1000)
    drawn = []

    def runner(cmd, env=None, **kw):
        cmd = list(cmd)
        if any("ks_test.py" in c for c in cmd):
            _mk_summary(a, {"10": 0.2, "20": 0.6})
        elif any("self_feed.py" in c for c in cmd):
            out = cmd[cmd.index("--out") + 1]
            seed = cmd[cmd.index("--seed") + 1]
            drawn.append((os.path.basename(out), seed))
            os.makedirs(out, exist_ok=True)
            # the ckpt-10 battery out-draws the in-run best at ckpt 20
            p = 0.95 if out.endswith("draws_ckpt10") else 0.3
            with open(os.path.join(out, "self_feed_draws.json"), "w") as fh:
                json.dump({"best_combined_pvalue": p,
                           "draws": [{"combined_pvalue": p}]}, fh)

    rc = pipeline.main(
        ["--workdir", wd, "--model", "graph_transformer", "--epochs", "20",
         "--min-checkpoints", "99", "--top-k", "2",
         "--draw-seed", "281", "--second-draw-seed", "9272"],
        runner=runner, wait_fn=lambda **k: True)
    assert rc == 0
    # first batteries at both checkpoints with the base seed, then the
    # second battery lands on ckpt 10 (its battery beat ckpt 20's in-run p)
    assert ("draws_ckpt20", "281") in drawn and ("draws_ckpt10", "281") in drawn
    assert drawn[-1] == ("draws2_ckpt10", "9272")
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["best"] == pytest.approx(0.95)


def test_main_reports_train_failure(tmp_path, capsys):
    rc = pipeline.main(["--workdir", str(tmp_path), "--model", "gt",
                        "--epochs", "1", "--deadline-hours", "0.0001"],
                       runner=lambda *a, **k: None, wait_fn=lambda **k: False)
    assert rc == 1
    assert json.loads(capsys.readouterr().out)["stage"] == "train"
