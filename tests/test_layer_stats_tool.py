"""Layer-stats forensic summarizer."""

import json

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.evaluation.layer_stats import (
    load_layer_stats,
    summarize,
)


def test_summarize_finds_first_nan(tmp_path):
    recs = [
        {"step": 0, "debug/layerA.absmax": 1.0, "debug/layerA.std": 0.5,
         "debug/layerA.nan_or_inf": 0.0, "debug/layerB.absmax": 2.0,
         "debug/layerB.nan_or_inf": 0.0},
        {"step": 4, "debug/layerA.absmax": 9.0, "debug/layerA.std": 2.0,
         "debug/layerA.nan_or_inf": 0.0, "debug/layerB.absmax": 50.0,
         "debug/layerB.nan_or_inf": 1.0},
    ]
    p = tmp_path / "layer_stats.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in recs))
    s = summarize(load_layer_stats(str(tmp_path)))
    assert s["num_records"] == 2
    assert s["first_nan_step"] == 4 and s["first_nan_layer"] == "layerB"
    assert s["layers"]["layerA"]["absmax_peak"] == 9.0
    assert s["layers"]["layerB"]["first_nan_step"] == 4
