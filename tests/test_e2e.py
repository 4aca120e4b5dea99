"""End-to-end: dataset -> Trainer -> epochs -> checkpoint + self-feed + KS
artifacts in the reference run-dir layout.  Tiny shapes to keep CPU fast."""

import json
import os

import numpy as np
import pytest

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.data import (
    GravityDatasetOtf,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.trainer import (
    create_trainer_from_args,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.config import (
    flatten_args,
)


def make_args(tmp, **over):
    cfg = {
        "main": {"model_type": "egnn_mc"},
        "models": {
            "egnn_mc": dict(num_layers=1, hidden_node_dim=16, hidden_edge_dim=16, hidden_coord_dim=16)
        },
        "dataloaders": {
            "egnn_mc_nbody": {
                "batch_size": 4,
                "cache_data": False,
                "seed": 0,
                "gravity_dataset": {"num_atoms": 5, "sim_length": 300, "sample_freq": 10},
            }
        },
        "trainers": {
            "trainer_nbody": {
                "steps_per_epoch": 3,
                "train_steps": 2,
                "save_model_every": 1,
                "test_macros_every": 1,
                "self_feed_limit_steps": 20,
                "plot_macros": False,
                "seed": 0,
                **over,
            }
        },
    }
    return flatten_args(cfg), cfg


def test_dataset_queue_semantics(tmp_run_dir):
    ds = GravityDatasetOtf(batch_size=2, sim_length=50, sample_freq=10, cache_data=False, seed=1)
    # 5 frames -> 4 usable frame pairs before regeneration
    seen = set()
    for _ in range(4):
        scene, y = ds.get_batch()
        assert scene.pos.shape == (2, 5, 3)
        assert y.shape == (2, 5, 6)
    assert len(ds._unused) == 0 and len(ds._ready) == 0
    ds.get_batch()  # triggers regeneration
    # frame-pair accounting unchanged by prefetch batching: 3 of the new
    # trajectory's 4 usable pairs remain (in the pool or already gathered)
    assert len(ds._unused) + len(ds._ready) == 3


def test_dataset_cache_roundtrip(tmp_run_dir):
    ds1 = GravityDatasetOtf(batch_size=2, sim_length=50, cache_data=True, seed=2)
    folder = ds1._cache_folder()
    assert os.path.isdir(folder) and any(f.endswith(".npz") for f in os.listdir(folder))
    # same explicit seed -> replays the cached sims byte-for-byte
    ds2 = GravityDatasetOtf(batch_size=2, sim_length=50, use_cached=True, cache_data=False, seed=2)
    np.testing.assert_allclose(
        np.asarray(ds1._traj["loc"]), np.asarray(ds2._traj["loc"]), rtol=1e-6
    )
    # a DIFFERENT explicit seed must not replay seed-2's cache (its cache
    # key includes the seed), so its trajectories are independent draws
    ds3 = GravityDatasetOtf(batch_size=2, sim_length=50, use_cached=True, cache_data=False, seed=3)
    assert ds3._cache_folder() != folder
    assert not np.allclose(np.asarray(ds1._traj["loc"]), np.asarray(ds3._traj["loc"]))


def test_full_training_run_with_self_feed(tmp_run_dir):
    args, cfg = make_args(tmp_run_dir, save_checkpoint_params=True)
    trainer = create_trainer_from_args(args, resolved_config=cfg)
    trainer.train()

    run = trainer.save_dir_path
    # run-dir artifact layout (trainer.py:513-541 + checkpoints)
    assert os.path.exists(os.path.join(run, "config.yaml"))
    assert os.path.exists(os.path.join(run, "training_args.json"))
    assert os.path.exists(os.path.join(run, "model_params.json"))
    assert os.path.exists(os.path.join(run, "nbody_small_dataset", "metadata.json"))
    assert os.path.exists(os.path.join(run, "model.ckpt"))
    assert os.path.exists(os.path.join(run, "metrics.jsonl"))

    ckpt_dir = os.path.join(run, "checkpoints", "1")
    assert os.path.exists(os.path.join(ckpt_dir, "sticking_distributions.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "nbody_macro_metrics.json"))
    # save_checkpoint_params: per-checkpoint params, loadable for re-rolls
    assert os.path.exists(os.path.join(ckpt_dir, "model.ckpt"))
    import jax

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.restore import (
        load_run,
    )

    _, ck_params, _, _ = load_run(
        run, checkpoint=os.path.join("checkpoints", "1", "model.ckpt")
    )
    assert jax.tree_util.tree_structure(ck_params) == jax.tree_util.tree_structure(
        trainer.params
    )
    with open(os.path.join(ckpt_dir, "nbody_macro_metrics.json")) as f:
        m = json.load(f)
    assert "ks_pvalues" in m and "combined" in m["ks_pvalues"]
    assert "energies" in m and "simulation_total" in m["energies"]

    # metrics stream has train + self_feed records with finite loss
    records = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
    train_recs = [r for r in records if "train/loss" in r]
    assert train_recs and all(np.isfinite(r["train/loss"]) for r in train_recs)
    sf_recs = [r for r in records if "self_feed/ks_combined" in r]
    assert sf_recs


@pytest.mark.slow
def test_layer_stats_and_nan_abort(tmp_run_dir):
    args, cfg = make_args(
        tmp_run_dir,
        debug_layer_stats_every=2,
        abort_on_nan_activations=True,
        test_macros_every=99,
    )
    trainer = create_trainer_from_args(args, resolved_config=cfg)
    trainer.train()
    stats_path = os.path.join(trainer.save_dir_path, "layer_stats.jsonl")
    assert os.path.exists(stats_path)
    recs = [json.loads(l) for l in open(stats_path)]
    assert recs and any(k.endswith(".absmax") for k in recs[0])
    assert any(k.endswith(".nan_or_inf") for k in recs[0])
    # training still progressed with the abort guard enabled
    metrics = [json.loads(l) for l in open(os.path.join(trainer.save_dir_path, "metrics.jsonl"))]
    assert any("train/loss" in r and np.isfinite(r["train/loss"]) for r in metrics)


def test_checkpoint_resume(tmp_run_dir):
    args, cfg = make_args(tmp_run_dir)
    trainer = create_trainer_from_args(args, resolved_config=cfg)
    trainer.train()
    ckpt_path = os.path.join(trainer.save_dir_path, "model.ckpt")

    args2, cfg2 = make_args(tmp_run_dir, model_path=ckpt_path)
    trainer2 = create_trainer_from_args(args2, resolved_config=cfg2)
    assert trainer2.step_count == 2  # resumed epoch counter
    for a, b in zip(
        np.asarray(list(trainer.params["params"].keys())),
        np.asarray(list(trainer2.params["params"].keys())),
    ):
        assert a == b


@pytest.mark.slow
def test_self_feed_cli_multi_draw(tmp_run_dir):
    args, cfg = make_args(tmp_run_dir, test_macros_every=99)
    trainer = create_trainer_from_args(args, resolved_config=cfg)
    trainer.train()
    run = trainer.save_dir_path

    import self_feed as self_feed_cli

    self_feed_cli.main(
        ["--run_dir", run, "--steps", "20", "--batch_size", "4", "--draws", "2"]
    )
    out = os.path.join(run, "generated_trajectories")
    with open(os.path.join(out, "self_feed_draws.json")) as f:
        d = json.load(f)
    assert len(d["draws"]) == 2
    assert d["best_combined_pvalue"] >= d["median_combined_pvalue"]
    # per-draw artifact dirs hold the six scored macro JSONs
    assert os.path.exists(
        os.path.join(out, "draw_00", "sticking_distributions.json")
    )
    assert os.path.exists(
        os.path.join(out, "draw_01", "collision_distributions.json")
    )


@pytest.mark.slow
def test_offline_dataloader_type_trains_on_offline_data(tmp_run_dir):
    """dataloader_type=segnn_nbody_offline must really train on the offline
    charged-systems dataset with its cutoff-rate edge masks (not silently
    fall back to the on-the-fly gravity dataset)."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.data.offline_datagen import (
        generate_offline_dataset,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.data.offline_dataset import (
        OfflineNBodyDataset,
    )

    data_dir = os.path.join(str(tmp_run_dir), "offline_data")
    generate_offline_dataset(
        data_dir, n_isolated=5, num_train=6, num_valid=2, num_test=2,
        length=200, length_test=200, sample_freq=50, seed=0,
    )
    cfg = {
        "main": {"model_type": "egnn_mc", "dataloader_type": "segnn_nbody_offline"},
        "models": {
            "egnn_mc": dict(
                num_layers=1, hidden_node_dim=16, hidden_edge_dim=16,
                hidden_coord_dim=16,
            )
        },
        "dataloaders": {
            "segnn_nbody_offline": {
                "batch_size": 2,
                "offline_dataset": {
                    "dataset_name": "5_0_0",
                    "data_directory": data_dir,
                    "frame_0": 1,
                    "frame_T": 3,
                    "cutoff_rate": 0.3,
                },
            }
        },
        "trainers": {
            "trainer_nbody": {
                "steps_per_epoch": 2,
                "train_steps": 1,
                "save_model_every": 99,
                "test_macros_every": 99,  # offline data has no GT rollouts
                "seed": 0,
            }
        },
    }
    args = flatten_args(cfg)
    trainer = create_trainer_from_args(args, resolved_config=cfg)
    assert isinstance(trainer.dataset, OfflineNBodyDataset)
    assert trainer._data_masks
    # cutoff_rate=0.3 prunes edges: the data mask is sparser than FC
    _, _, mask = trainer.dataset.get_batch()
    n = trainer.dataset.num_nodes
    assert int(np.asarray(mask).sum()) < mask.shape[0] * n * (n - 1)
    log = trainer.train_one_epoch()
    assert np.isfinite(log["train/loss"])
