"""Inferencer: load a finished run and serve predictions/rollouts."""

import json
import os

import jax
import numpy as np

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.rollout.inferencer import (
    Inferencer,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.trainer import (
    create_trainer_from_args,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.config import (
    flatten_args,
)

import pytest


@pytest.mark.slow
def test_inferencer_roundtrip(tmp_run_dir):
    cfg = {
        "main": {"model_type": "egnn_mc"},
        "models": {"egnn_mc": dict(num_layers=1, hidden_node_dim=16,
                                   hidden_edge_dim=16, hidden_coord_dim=16)},
        "dataloaders": {"egnn_mc_nbody": {
            "batch_size": 4, "cache_data": False, "seed": 0,
            "gravity_dataset": {"num_atoms": 5, "sim_length": 200, "sample_freq": 10},
        }},
        "trainers": {"trainer_nbody": {
            "steps_per_epoch": 2, "train_steps": 1, "save_model_every": 1,
            "test_macros_every": 99, "plot_macros": False, "seed": 0,
        }},
    }
    trainer = create_trainer_from_args(flatten_args(cfg))
    trainer.train()

    inf = Inferencer(trainer.save_dir_path)
    scene, _ = inf.dataset.get_batch()
    pred = inf.predict(scene)
    assert pred.shape == (4, 5, 6)

    loc, vel, survived = inf.rollout(scene, num_steps=10)
    assert loc.shape == (4, 10, 5, 3) and survived >= 0

    result = inf.evaluate(num_steps=15)
    assert "combined" in result and result["steps_survived"] >= 0
