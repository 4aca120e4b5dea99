"""bench.py last-good-result cache: a tunnel outage at bench time must
still yield the one-line JSON contract (stale-marked re-emission of the
last on-hardware measurement, or an explicit error line)."""

import json

import pytest

import bench


def _payload(metric="self_feed_rollout_steps_per_sec_n100_egnn_mc", value=201.4):
    return {
        "metric": metric,
        "value": value,
        "unit": "steps/s",
        "vs_baseline": round(value / 30.0, 2),
    }


def test_emit_writes_cache_and_prints_contract_line(tmp_path, monkeypatch, capsys):
    cache_file = tmp_path / "bench_last_good.json"
    monkeypatch.setattr(bench, "_LAST_GOOD", str(cache_file))
    bench.emit(_payload())
    line = capsys.readouterr().out.strip()
    parsed = json.loads(line)
    # stdout line carries the payload plus self-describing provenance
    for k, v in _payload().items():
        assert parsed[k] == v
    for k in ("n_bodies", "batch", "model"):
        assert k in parsed
    cache = json.loads(cache_file.read_text())
    assert cache["latest"] == parsed["metric"]
    entry = cache[parsed["metric"]]
    assert entry["value"] == 201.4 and "measured_at" in entry


def test_emit_cache_keeps_other_modes(tmp_path, monkeypatch, capsys):
    cache_file = tmp_path / "bench_last_good.json"
    monkeypatch.setattr(bench, "_LAST_GOOD", str(cache_file))
    bench.emit(_payload())
    bench.emit(_payload(metric="train_steps_per_sec_n5_egnn_mc", value=100.0))
    capsys.readouterr()
    cache = json.loads(cache_file.read_text())
    assert "self_feed_rollout_steps_per_sec_n100_egnn_mc" in cache
    assert "train_steps_per_sec_n5_egnn_mc" in cache
    assert cache["latest"] == "train_steps_per_sec_n5_egnn_mc"


def test_stale_emission_when_backend_down(tmp_path, monkeypatch, capsys):
    cache_file = tmp_path / "bench_last_good.json"
    monkeypatch.setattr(bench, "_LAST_GOOD", str(cache_file))
    monkeypatch.setattr(bench, "MODE", "rollout")
    bench.emit(_payload())
    capsys.readouterr()
    with pytest.raises(SystemExit) as ei:
        bench.emit_stale_or_die("tunnel down")
    assert ei.value.code == 0
    parsed = json.loads(capsys.readouterr().out.strip())
    assert parsed["stale"] is True
    assert parsed["stale_reason"] == "tunnel down"
    assert parsed["value"] == 201.4 and "measured_at" in parsed


def test_stale_emission_picks_matching_mode(tmp_path, monkeypatch, capsys):
    cache_file = tmp_path / "bench_last_good.json"
    monkeypatch.setattr(bench, "_LAST_GOOD", str(cache_file))
    bench.emit(_payload())
    bench.emit(_payload(metric="train_steps_per_sec_n5_egnn_mc", value=100.0))
    capsys.readouterr()
    monkeypatch.setattr(bench, "MODE", "train")
    with pytest.raises(SystemExit) as ei:
        bench.emit_stale_or_die("down")
    assert ei.value.code == 0
    parsed = json.loads(capsys.readouterr().out.strip())
    assert parsed["metric"].startswith("train_steps_per_sec")


def test_has_cached_result_mode_aware(tmp_path, monkeypatch, capsys):
    cache_file = tmp_path / "bench_last_good.json"
    monkeypatch.setattr(bench, "_LAST_GOOD", str(cache_file))
    monkeypatch.setattr(bench, "MODE", "rollout")
    assert not bench._has_cached_result()  # no cache file yet
    bench.emit(_payload())
    capsys.readouterr()
    assert bench._has_cached_result()
    monkeypatch.setattr(bench, "MODE", "train")
    assert not bench._has_cached_result()  # rollout entry doesn't cover train


def test_backend_wait_budget_shrinks_when_cache_exists(tmp_path, monkeypatch, capsys):
    """With a stale fallback available the probe window must stay well under
    any plausible driver timeout; without one it holds out longer."""
    cache_file = tmp_path / "bench_last_good.json"
    monkeypatch.setattr(bench, "_LAST_GOOD", str(cache_file))
    monkeypatch.setattr(bench, "MODE", "rollout")
    monkeypatch.delenv("BENCH_BACKEND_WAIT_S", raising=False)
    seen = {}

    def fake_wait(max_wait_s, **kw):
        seen["budget"] = max_wait_s
        return True

    import extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.device as device

    monkeypatch.setattr(device, "wait_for_backend", fake_wait)
    bench._wait_for_healthy_backend()
    assert seen["budget"] == 1800.0  # no cache: hold out for the tunnel
    bench.emit(_payload())
    capsys.readouterr()
    bench._wait_for_healthy_backend()
    assert seen["budget"] == 480.0  # cached fallback: fail over quickly
    monkeypatch.setenv("BENCH_BACKEND_WAIT_S", "33")
    bench._wait_for_healthy_backend()
    assert seen["budget"] == 33.0  # explicit override wins
    # malformed / empty override falls back to the cache-aware default
    # instead of crashing before any JSON line is printed
    monkeypatch.setenv("BENCH_BACKEND_WAIT_S", "8m")
    bench._wait_for_healthy_backend()
    assert seen["budget"] == 480.0
    monkeypatch.setenv("BENCH_BACKEND_WAIT_S", "")
    bench._wait_for_healthy_backend()
    assert seen["budget"] == 480.0


def test_error_line_when_no_cache(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_LAST_GOOD", str(tmp_path / "absent.json"))
    monkeypatch.setattr(bench, "MODE", "rollout")
    with pytest.raises(SystemExit) as ei:
        bench.emit_stale_or_die("tunnel down")
    assert ei.value.code == 1
    parsed = json.loads(capsys.readouterr().out.strip())
    assert parsed["value"] == 0.0 and parsed["error"] == "tunnel down"


def test_busy_chip_emits_stale_instead_of_contended(tmp_path, monkeypatch, capsys):
    """A chase queue can hold the chip for the whole round: with a cached
    result, bench must emit the stale line rather than measure contended
    (which would under-report AND poison the cache)."""
    cache_file = tmp_path / "bench_last_good.json"
    monkeypatch.setattr(bench, "_LAST_GOOD", str(cache_file))
    bench.emit(_payload(value=201.72))
    capsys.readouterr()
    monkeypatch.setattr(bench, "_tpu_busy", lambda: True)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as exc:
        bench._wait_for_idle_chip(max_wait_s=0.0)
    assert exc.value.code == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["stale"] is True and out["value"] == 201.72
    assert "chip held" in out["stale_reason"]
    # the cache itself must be untouched (no contended overwrite)
    assert json.load(open(cache_file))[out["metric"]]["value"] == 201.72


def test_busy_chip_without_cache_proceeds(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_LAST_GOOD", str(tmp_path / "missing.json"))
    monkeypatch.setattr(bench, "_tpu_busy", lambda: True)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._wait_for_idle_chip(max_wait_s=0.0)  # returns: contended measure
    assert "measuring contended" in capsys.readouterr().err


def test_idle_chip_starts_immediately(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_tpu_busy", lambda: False)
    bench._wait_for_idle_chip(max_wait_s=0.0)
    err = capsys.readouterr().err
    assert "busy" not in err


def test_pick_headline_prefers_quality_within_noise():
    """Headline = best steps/s among configs whose survived_min is within
    SURVIVED_TOL of the f32 reference config (round-2 VERDICT #6): a ~1%
    speed edge must not win with 75 fewer survived steps."""
    results = {
        "xla-float32": (159.0, 476),
        "xla-bfloat16": (201.6, 404),      # fast but fidelity-degraded
        "xla-mixed-bf16": (199.2, 479),    # matches f32 fidelity
    }
    assert bench.pick_headline(results) == "xla-mixed-bf16"
    # when the fast config also matches fidelity, it wins outright
    results["xla-bfloat16"] = (201.6, 475)
    assert bench.pick_headline(results) == "xla-bfloat16"
    # no f32 reference measured -> plain fastest
    del results["xla-float32"]
    results["xla-bfloat16"] = (201.6, 404)
    assert bench.pick_headline(results) == "xla-bfloat16"
