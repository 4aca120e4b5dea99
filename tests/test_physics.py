"""Physics integrator: parity vs an independent NumPy port of the reference
math (``synthetic_sim.py:318-473``), energy conservation, CoM frame."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
    physics,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.physics import (
    GravityParams,
)


def numpy_acceleration(pos, mass, G, softening):
    """Straight NumPy transcription of the reference formula for testing."""
    x, y, z = pos[:, 0:1], pos[:, 1:2], pos[:, 2:3]
    dx, dy, dz = x.T - x, y.T - y, z.T - z
    inv_r3 = dx**2 + dy**2 + dz**2 + softening**2
    inv_r3[inv_r3 > 0] = inv_r3[inv_r3 > 0] ** (-1.5)
    ax = G * (dx * inv_r3) @ mass
    ay = G * (dy * inv_r3) @ mass
    az = G * (dz * inv_r3) @ mass
    return np.hstack((ax, ay, az))


def numpy_leapfrog(pos, vel, mass, G, softening, dt, steps):
    acc = numpy_acceleration(pos, mass, G, softening)
    out = []
    for _ in range(steps):
        vel = vel + acc * dt / 2.0
        pos = pos + vel * dt
        acc = numpy_acceleration(pos, mass, G, softening)
        vel = vel + acc * dt / 2.0
        out.append((pos.copy(), vel.copy()))
    return out


def test_acceleration_matches_numpy():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(7, 3))
    mass = np.abs(rng.normal(size=(7, 1))) + 0.5
    want = numpy_acceleration(pos, mass, 2.0, 0.2)
    got = physics.compute_acceleration(
        jnp.asarray(pos), jnp.asarray(mass), 2.0, 0.2
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_leapfrog_matches_numpy_trajectory():
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(5, 3))
    vel = rng.normal(size=(5, 3))
    mass = np.ones((5, 1))
    params = GravityParams(interaction_strength=2.0, softening=0.2, dt=0.01)

    ref = numpy_leapfrog(pos.copy(), vel.copy(), mass, 2.0, 0.2, 0.01, 50)

    p, v = jnp.asarray(pos), jnp.asarray(vel)
    a = physics.compute_acceleration(p, jnp.asarray(mass), 2.0, 0.2)
    for i in range(50):
        p, v, a = physics.leapfrog_step(p, v, a, jnp.asarray(mass), params)
    np.testing.assert_allclose(np.asarray(p), ref[-1][0], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(v), ref[-1][1], rtol=1e-8, atol=1e-10)


def test_energy_matches_reference_formula():
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(5, 3))
    vel = rng.normal(size=(5, 3))
    mass = np.ones((5, 1))
    soft, G = 0.2, 2.0
    ke_ref = 0.5 * np.sum(mass * vel**2)
    x, y, z = pos[:, 0:1], pos[:, 1:2], pos[:, 2:3]
    dx, dy, dz = x.T - x, y.T - y, z.T - z
    inv_r = np.sqrt(dx**2 + dy**2 + dz**2 + soft**2)
    inv_r[inv_r > 0] = 1.0 / inv_r[inv_r > 0]
    pe_ref = G * np.sum(np.triu(-(mass * mass.T) * inv_r, 1))
    ke, pe, te = physics.energies(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass), G, soft)
    assert np.isclose(float(ke), ke_ref)
    assert np.isclose(float(pe), pe_ref)
    assert np.isclose(float(te), ke_ref + pe_ref)


def test_trajectory_energy_drift_small():
    loc, vel, force, mass = physics.sample_trajectory(
        jax.random.PRNGKey(0), n_bodies=5, T=2000, sample_freq=10, dtype=jnp.float64
    )
    ke, pe, te = physics.energies(loc, vel, mass[None], 2.0, 0.2)
    drift = np.abs((np.asarray(te) - float(te[0])) / float(te[0]))
    assert drift.max() < 0.05  # leapfrog is symplectic; drift stays bounded


def test_com_frame_and_shapes():
    loc, vel, force, mass = physics.sample_trajectory_batch(
        jax.random.PRNGKey(1), batch_size=3, n_bodies=5, T=100, sample_freq=10
    )
    assert loc.shape == (3, 10, 5, 3)
    assert mass.shape == (3, 5, 1)
    # initial frame is in the CoM momentum frame (synthetic_sim.py:380-381)
    mom0 = np.asarray(jnp.sum(mass * vel[:, 0], axis=1))
    np.testing.assert_allclose(mom0, 0.0, atol=1e-5)
    # frame k equals state after k*sample_freq substeps: force = acc * mass
    np.testing.assert_allclose(
        np.asarray(force[:, 0]),
        np.asarray(
            physics.compute_acceleration(loc[:, 0], mass, 2.0, 0.2) * mass
        ),
        rtol=1e-4,  # f32 fusion-order differences between in-scan and fresh
        atol=1e-5,
    )


def test_density_scaling_init():
    pos, vel, mass = physics.sample_initial_conditions(jax.random.PRNGKey(2), 40)
    # std ~ cbrt(40/5) = 2 (synthetic_sim.py:375-377)
    assert 1.5 < float(jnp.std(pos)) < 2.5
