"""Config: YAML + dot overrides + flatten semantics."""

import os

import pytest
import yaml

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.config import (
    flatten_args,
    parse_args,
    save_config,
)

REPO_CONFIG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config.yaml")


def test_default_config_parses():
    args, cfg = parse_args(["--config", REPO_CONFIG])
    assert args.model_type == "egnn_mc"
    assert args.batch_size == 64
    assert args.target == "pos_dt+vel"
    assert args.learning_rate == 0.5
    assert args.steps_per_epoch == 1000


def test_dot_overrides():
    args, _ = parse_args(
        [
            "--config", REPO_CONFIG,
            "--main.model_type", "painn",
            "--model.num_layers", "3",
            "--trainer.learning_rate", "0.1",
            "--dataloader.batch_size=16",
            "--dataloader.gravity_dataset.num_atoms", "7",
        ]
    )
    assert args.model_type == "painn"
    assert args.dataloader_type == "painn_nbody"
    assert args.model_kwargs["num_layers"] == 3
    assert args.learning_rate == 0.1
    assert args.batch_size == 16
    assert args.num_atoms == 7
    assert args.num_neighbors == 4  # painn_nbody section default


def test_type_coercion_and_null():
    args, _ = parse_args(
        ["--config", REPO_CONFIG, "--trainer.train_steps", "null",
         "--trainer.discard_nan_gradients", "true"]
    )
    assert args.train_steps is None
    assert args.discard_nan_gradients is True


def test_flatten_from_dict_roundtrip(tmp_path):
    cfg = {
        "main": {"model_type": "graph_transformer"},
        "models": {"graph_transformer": {"hidden_features": 32}},
        "trainers": {"trainer_nbody": {"learning_rate": 0.25}},
    }
    args = flatten_args(cfg)
    assert args.model_kwargs == {"hidden_features": 32}
    assert args.learning_rate == 0.25
    save_config(cfg, str(tmp_path))
    loaded = yaml.safe_load((tmp_path / "config.yaml").read_text())
    assert loaded == cfg
