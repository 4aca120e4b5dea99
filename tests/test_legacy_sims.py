"""Legacy spring / charged-particle simulators."""

import jax
import jax.numpy as jnp
import numpy as np

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.legacy_sims import (
    ChargedParams,
    SpringParams,
    sample_charged_batch,
    sample_charged_trajectory,
    sample_spring_trajectory,
)


def test_spring_trajectory_shapes_and_edges():
    loc, vel, edges = sample_spring_trajectory(
        jax.random.PRNGKey(0), n_balls=5, T=1000, sample_freq=10
    )
    assert loc.shape == (99, 3, 5)  # T/freq - 1 frames, [T, dim, N]
    assert vel.shape == (99, 3, 5)
    e = np.asarray(edges)
    np.testing.assert_allclose(e, e.T)  # symmetric couplings
    assert np.all(np.diag(e) == 0)
    assert set(np.unique(e)).issubset({0.0, 0.5, 1.0})
    assert bool(jnp.isfinite(loc).all())


def test_spring_bounded_motion():
    # springs + small dt keep the system bounded near the origin
    loc, vel, edges = sample_spring_trajectory(
        jax.random.PRNGKey(1), n_balls=5, T=2000, sample_freq=10
    )
    assert float(jnp.abs(loc).max()) < 50.0


def test_charged_trajectory_and_charges():
    loc, vel, edges, charges = sample_charged_trajectory(
        jax.random.PRNGKey(2), n_balls=5, T=1000, sample_freq=10
    )
    assert loc.shape == (99, 3, 5)
    c = np.asarray(charges)
    assert set(np.unique(c)).issubset({-1.0, 1.0})
    np.testing.assert_allclose(np.asarray(edges), c @ c.T)
    assert bool(jnp.isfinite(loc).all())


def test_charged_batch_vmap():
    loc, vel, edges, charges = sample_charged_batch(
        jax.random.PRNGKey(3), batch_size=4, n_balls=5, T=200, sample_freq=10
    )
    assert loc.shape == (4, 19, 3, 5)
    # independent sims differ
    assert not np.allclose(np.asarray(loc[0]), np.asarray(loc[1]))


def test_initial_frame_within_box():
    loc, vel, edges = sample_spring_trajectory(
        jax.random.PRNGKey(4), n_balls=8, T=100, sample_freq=10,
        params=SpringParams(box_size=5.0),
    )
    assert float(jnp.abs(loc[0]).max()) <= 5.0  # clamped initial state
