"""Offline datagen (constrained rigid systems) + dataset loader."""

import numpy as np
import jax
import pytest

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.data.offline_datagen import (
    generate_offline_dataset,
    simulate_system,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.data.offline_dataset import (
    OfflineNBodyDataset,
)


def test_isolated_system_runs():
    loc, vel, edges, charges = simulate_system(
        jax.random.PRNGKey(0), n_isolated=5, n_stick=0, n_hinge=0,
        T=500, sample_freq=50,
    )
    assert loc.shape == (10, 5, 3)
    assert np.isfinite(np.asarray(loc)).all()
    c = np.asarray(charges)
    np.testing.assert_allclose(np.asarray(edges), c @ c.T)


def test_stick_constraint_preserved():
    loc, vel, edges, charges = simulate_system(
        jax.random.PRNGKey(1), n_isolated=1, n_stick=2, n_hinge=0,
        T=500, sample_freq=10,
    )
    loc = np.asarray(loc)
    # sticks occupy nodes (1,2) and (3,4); lengths must stay constant
    for (a, b) in [(1, 2), (3, 4)]:
        lengths = np.linalg.norm(loc[:, a] - loc[:, b], axis=-1)
        np.testing.assert_allclose(lengths, lengths[0], rtol=1e-4)


def test_hinge_constraint_preserved():
    loc, vel, edges, charges = simulate_system(
        jax.random.PRNGKey(2), n_isolated=0, n_stick=0, n_hinge=1,
        T=500, sample_freq=10,
    )
    loc = np.asarray(loc)
    # hinge beams (0-1) and (0-2) keep their lengths
    for b in (1, 2):
        lengths = np.linalg.norm(loc[:, b] - loc[:, 0], axis=-1)
        np.testing.assert_allclose(lengths, lengths[0], rtol=1e-4)


def test_generate_and_load_roundtrip(tmp_path):
    tag = generate_offline_dataset(
        str(tmp_path), n_isolated=5, n_stick=0, n_hinge=0,
        num_train=6, num_valid=2, num_test=2, length=400, length_test=400,
        sample_freq=50, seed=0,
    )
    assert tag == "_charged5_0_0"
    ds = OfflineNBodyDataset(
        "5_0_0", str(tmp_path), partition="train", frame_0=2, frame_T=5,
        batch_size=3,
    )
    assert len(ds) == 6 and ds.num_nodes == 5
    scene, y, mask = ds.get_batch()
    assert scene.pos.shape == (3, 5, 3)
    assert y.shape == (3, 5, 6)
    assert mask.shape == (3, 5, 5)
    assert int(mask.sum()) == 3 * 5 * 4  # cutoff_rate 0 -> fully connected

    # cutoff pruning removes the largest distances
    ds2 = OfflineNBodyDataset(
        "5_0_0", str(tmp_path), partition="train", frame_0=2, frame_T=5,
        batch_size=3, cutoff_rate=0.5,
    )
    _, _, mask2 = ds2.get_batch()
    assert int(mask2.sum()) == 3 * int(5 * 4 * 0.5)

    # test split applies rotation augmentation but keeps geometry (distances)
    ds_test = OfflineNBodyDataset(
        "5_0_0", str(tmp_path), partition="test", frame_0=2, frame_T=5,
        batch_size=2,
    )
    raw = np.load(tmp_path / "loc_test_charged5_0_0.npy")[:, 2]
    d_raw = np.linalg.norm(raw[:, :, None] - raw[:, None, :], axis=-1)
    d_rot = np.linalg.norm(
        ds_test.loc_0[:, :, None] - ds_test.loc_0[:, None, :], axis=-1
    )
    np.testing.assert_allclose(d_rot, d_raw, atol=1e-3)
    assert not np.allclose(ds_test.loc_0, raw, atol=1e-5)  # actually rotated


@pytest.mark.slow
def test_offline_batch_feeds_models(tmp_path):
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models import (
        create_model,
    )

    generate_offline_dataset(
        str(tmp_path), n_isolated=5, num_train=4, num_valid=1, num_test=1,
        length=200, length_test=200, sample_freq=50,
    )
    ds = OfflineNBodyDataset("5_0_0", str(tmp_path), frame_0=1, frame_T=3, batch_size=2)
    scene, y, mask = ds.get_batch()
    m = create_model("egnn_mc", num_layers=1, hidden_node_dim=16,
                     hidden_edge_dim=16, hidden_coord_dim=16)
    params = m.init(jax.random.PRNGKey(0), scene, mask)
    out = m.apply(params, scene, mask)
    assert out.shape == (2, 5, 6)


def test_dataloader_layer_api(tmp_path, monkeypatch):
    """The L2 dataloader registry exposes the reference API shape."""
    monkeypatch.chdir(tmp_path)
    from types import SimpleNamespace

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.data.dataloaders import (
        create_dataloader,
    )

    args = SimpleNamespace(
        model_type="painn", dataloader_type="painn_nbody", dataset_name="nbody_small",
        target="pos_dt+vel", batch_size=3, sample_freq=10, sim_length=200,
        num_atoms=5, num_neighbors=4, cache_data=False, use_cached=False,
        model_path=None, data_seed=0,
    )
    dl = create_dataloader(args)
    scene, y = dl.get_batch()
    mask = dl.preprocess_batch(scene)
    assert scene.pos.shape == (3, 5, 3) and y.shape == (3, 5, 6)
    assert int(mask.sum()) == 3 * 5 * 4  # k=4 neighbours
    assert dl.get_num_nodes() == 5
    assert dl.postprocess_batch(y) is y


def test_offline_dataloader_layer(tmp_path):
    from types import SimpleNamespace

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.data.dataloaders import (
        create_dataloader,
    )

    generate_offline_dataset(
        str(tmp_path), n_isolated=5, num_train=4, num_valid=1, num_test=1,
        length=200, length_test=200, sample_freq=50,
    )
    args = SimpleNamespace(
        model_type="segnn", dataloader_type="segnn_nbody_offline",
        dataset_name="5_0_0", data_directory=str(tmp_path),
        target="pos_dt+vel", batch_size=2, frame_0=1, frame_T=3,
    )
    dl = create_dataloader(args)
    scene, y = dl.get_batch()
    mask = dl.preprocess_batch(scene)
    assert scene.pos.shape == (2, 5, 3) and mask.shape == (2, 5, 5)


def test_valid_partition_is_independent_of_training_stream(tmp_path, monkeypatch):
    """A partition="valid" OTF dataloader must not replay the training
    trajectories: it bypasses the sim cache and, for a seeded run, draws
    from a disjoint seeded stream (no validation leakage)."""
    monkeypatch.chdir(tmp_path)
    from types import SimpleNamespace

    import numpy as np

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.data.dataloaders import (
        create_dataloader,
    )

    args = SimpleNamespace(
        model_type="painn", dataloader_type="painn_nbody", dataset_name="nbody_small",
        target="pos_dt+vel", batch_size=2, sample_freq=10, sim_length=100,
        num_atoms=5, num_neighbors=4, cache_data=True, use_cached=True,
        model_path=None, data_seed=5,
    )
    train_ds = create_dataloader(args, partition="train").dataset
    valid_ds = create_dataloader(args, partition="valid").dataset
    # the valid stream neither reads nor writes the shared sim cache
    assert train_ds.cache_data and not valid_ds.cache_data
    assert train_ds.use_cached and not valid_ds.use_cached
    # seeded runs: disjoint deterministic streams (different trajectories)
    t_loc = np.asarray(train_ds._traj["loc"])
    v_loc = np.asarray(valid_ds._traj["loc"])
    assert t_loc.shape == v_loc.shape
    assert not np.allclose(t_loc, v_loc)
    # a re-created valid loader reproduces its own stream (determinism)
    valid_ds2 = create_dataloader(args, partition="valid").dataset
    assert np.allclose(v_loc, np.asarray(valid_ds2._traj["loc"]))


def test_offline_dataloader_forwards_data_seed(tmp_path):
    """args.data_seed reaches OfflineNBodyDataset: different seeds give
    different batch selections (previously the hard-coded seed 0 made every
    'independent' run byte-identical)."""
    from types import SimpleNamespace

    import numpy as np

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.data.dataloaders import (
        create_dataloader,
    )

    generate_offline_dataset(
        str(tmp_path), n_isolated=5, num_train=8, num_valid=1, num_test=1,
        length=200, length_test=200, sample_freq=50,
    )

    def first_batch(seed):
        args = SimpleNamespace(
            model_type="segnn", dataloader_type="segnn_nbody_offline",
            dataset_name="5_0_0", data_directory=str(tmp_path),
            target="pos_dt+vel", batch_size=2, frame_0=1, frame_T=3,
            data_seed=seed,
        )
        scene, _ = create_dataloader(args).get_batch()
        return np.asarray(scene.pos)

    a1, a2 = first_batch(1), first_batch(1)
    b = first_batch(2)
    np.testing.assert_array_equal(a1, a2)  # same seed -> same stream
    assert not np.array_equal(a1, b)       # different seed -> different
