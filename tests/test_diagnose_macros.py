"""Per-macro KS diagnosis CLI (scripts/diagnose_macros.py)."""

import json
import sys

sys.path.insert(0, "scripts")

from diagnose_macros import main  # noqa: E402


def _write_run(tmp_path):
    run = tmp_path / "run"
    (run / "draws_ckpt20").mkdir(parents=True)
    ks = {
        "results": [
            {
                "checkpoint": 10,
                "combined_pvalue": 1e-6,
                "leaving_count": 1e-7,
                "sticking_histogram": 0.4,
                "energy_total": 1e-50,  # diagnostics: excluded from macros
            },
            {
                "checkpoint": 20,
                "combined_pvalue": 3e-3,
                "leaving_count": 2e-3,
                "sticking_histogram": 0.9,
            },
        ]
    }
    (run / "ks_summary.json").write_text(json.dumps(ks))
    draws = {
        "draws": [
            {
                "draw": 0,
                "combined_pvalue": 5e-4,
                "per_macro": {"leaving_count": 1e-4, "sticking_histogram": 0.7},
            }
        ]
    }
    (run / "draws_ckpt20" / "self_feed_draws.json").write_text(json.dumps(draws))
    return run


def test_diagnose_run_dir(tmp_path, capsys):
    run = _write_run(tmp_path)
    assert main([str(run)]) == 0
    out = capsys.readouterr().out
    assert "3 scored records" in out
    # leaving_count is the binding macro in all three records
    assert "verdict: 'leaving_count' binds (3/3" in out
    # energy diagnostics never appear in the macro table
    assert "energy_total" not in out


def test_diagnose_json_file_and_empty(tmp_path, capsys):
    run = _write_run(tmp_path)
    assert main([str(run / "draws_ckpt20" / "self_feed_draws.json")]) == 0
    assert "1 scored records" in capsys.readouterr().out
    empty = tmp_path / "empty"
    empty.mkdir()
    assert main([str(empty)]) == 1
