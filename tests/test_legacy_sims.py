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


def test_first_frame_near_clamped_box():
    # frames start at i=sample_freq (the reference's save counter overwrites
    # its initial frame, synthetic_sim.py:103,129-131), so frame 0 is the
    # clamped initial state advanced by freq tiny Euler steps
    loc, vel, edges = sample_spring_trajectory(
        jax.random.PRNGKey(4), n_balls=8, T=100, sample_freq=10,
        params=SpringParams(box_size=5.0),
    )
    assert float(jnp.abs(loc[0]).max()) <= 5.0 + 0.1


def _numpy_euler_reference(loc0, vel0, forces_size_fn, dt, T, freq, max_f):
    """Literal transcription of the reference save/kick ordering
    (``synthetic_sim.py:103-152``), in [N, d] layout."""
    t_save = T // freq - 1
    locs = np.zeros((t_save,) + loc0.shape)
    vels = np.zeros_like(locs)
    loc, vel = loc0.copy(), vel0.copy()

    def pair_force(loc):
        rel = loc[:, None, :] - loc[None, :, :]
        F = (forces_size_fn(loc)[..., None] * rel).sum(axis=1)
        return np.clip(F, -max_f, max_f)

    counter = 0
    vel = vel + dt * pair_force(loc)
    for i in range(1, T):
        loc = loc + dt * vel
        if i % freq == 0:
            locs[counter], vels[counter] = loc, vel
            counter += 1
        vel = vel + dt * pair_force(loc)
    return locs, vels


def test_simulate_matches_reference_transcription():
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
        legacy_sims as L,
    )

    rng = np.random.default_rng(0)
    n, dim, T, freq = 4, 3, 200, 10
    loc0 = rng.normal(size=(n, dim)) * 0.5
    vel0 = rng.normal(size=(n, dim)) * 0.5
    edges = rng.choice([0.0, 0.5, 1.0], size=(n, n))
    edges = np.tril(edges) + np.tril(edges, -1).T
    np.fill_diagonal(edges, 0.0)
    params = SpringParams()
    fs = -params.interaction_strength * edges

    want_loc, want_vel = _numpy_euler_reference(
        loc0, vel0, lambda loc: fs, params.dt, T, freq, 0.1 / params.dt
    )
    got_loc, got_vel = L._simulate(
        jnp.asarray(loc0), jnp.asarray(vel0), lambda loc: jnp.asarray(fs),
        params, T, freq, jax.random.PRNGKey(0), dim, n,
    )
    # ours returns reference layout [T_save, dim, N]
    np.testing.assert_allclose(
        np.asarray(got_loc), want_loc.swapaxes(1, 2), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_vel), want_vel.swapaxes(1, 2), rtol=1e-5, atol=1e-6
    )
