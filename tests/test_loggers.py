"""Pluggable logger layer + MetricsLogger JSONL stream + profiling helpers."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_jsonl_logger_and_manager(tmp_path):
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.loggers import (
        JSONLLogger,
        LoggingManager,
        TensorBoardLogger,
    )

    lg = JSONLLogger(str(tmp_path))
    lg.log_scalar("loss", 0.5, step=1)
    lg.log_dict({"a": 1.0, "b": "text"}, step=2)
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["loss"] == 0.5 and recs[0]["step"] == 1
    assert recs[1]["a"] == 1.0 and recs[1]["b"] == "text"

    # manager fans out to every backend; unavailable backends degrade
    mgr = LoggingManager([lg, TensorBoardLogger(str(tmp_path / "tb"))])
    mgr.log_scalar("x", 2.0, step=3)
    mgr.log_histogram("h", np.arange(5), step=3)
    mgr.finish()
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert recs[-1]["x"] == 2.0


def test_metrics_logger_stream(tmp_path):
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.logging_utils import (
        MetricsLogger,
    )

    ml = MetricsLogger(str(tmp_path))
    ml.log({"train/loss": 1.0, "train/step": 0})
    ml.log({"valid/loss": 0.5, "valid/step": 0})
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(recs) == 2 and "_time" in recs[0]
    assert recs[0]["train/loss"] == 1.0


def test_profiling_time_fn():
    import jax.numpy as jnp

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.profiling import (
        time_fn,
    )

    import jax

    f = jax.jit(lambda x: x * 2 + 1)
    out = time_fn(f, jnp.ones((8, 8)), warmup=1, iters=3)
    assert out["iters"] == 3 and out["min_s"] <= out["mean_s"] <= out["max_s"]
