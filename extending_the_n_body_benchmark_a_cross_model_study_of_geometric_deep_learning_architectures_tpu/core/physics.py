"""Softened-gravity leapfrog physics as pure JAX functions.

TPU-native replacement for the reference NumPy integrator
(``datasets/nbody/dataset/synthetic_sim.py``):

* ``compute_acceleration``  — math of ``synthetic_sim.py:318-340`` (dense
  pairwise ``1/r^3`` matrix, softening added inside the square).
* ``leapfrog_step``         — KDK step of ``synthetic_sim.py:342-355``.
* ``sample_trajectory``     — ``synthetic_sim.py:357-420``: CoM-frame random
  init, save every ``sample_freq`` sub-steps *before* stepping, optional
  observation noise.  Implemented as a nested ``lax.scan`` (outer over saved
  frames, inner over sub-steps) so a whole 10k-step trajectory is one XLA
  program instead of 10k Python iterations.
* ``sample_trajectory_batch`` — ``vmap`` over independent sims; replaces the
  reference's ``ProcessPoolExecutor`` fan-out
  (``datasets/nbody/dataset_gravity_otf.py:96-104``).
* ``energies`` — KE/PE of ``synthetic_sim.py:450-473``, vectorised over
  arbitrary leading axes (steps, sims).

All functions are shape-polymorphic over leading batch axes and
dtype-polymorphic (f32 on TPU by default; f64 for CPU parity tests).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class GravityParams(NamedTuple):
    """Physical constants of the simulator (``synthetic_sim.py:305-316`` and
    dataset defaults ``dataset_gravity_otf.py:40-45``)."""

    interaction_strength: float = 2.0  # "G"
    softening: float = 0.2
    dt: float = 0.01
    noise_var: float = 0.0


def compute_acceleration(pos: jnp.ndarray, mass: jnp.ndarray, G, softening) -> jnp.ndarray:
    """Acceleration of every body from softened pairwise gravity.

    ``a_i = G * sum_j (r_j - r_i) / (|r_j - r_i|^2 + eps^2)^{3/2} * m_j``

    Args:
      pos:  ``[..., N, 3]``.
      mass: ``[..., N, 1]``.
    Returns:
      ``[..., N, 3]`` accelerations.
    """
    # rel[..., i, j, :] = r_j - r_i  (matches dx = x.T - x orientation of the
    # reference, synthetic_sim.py:326-328).
    rel = pos[..., None, :, :] - pos[..., :, None, :]
    r2 = jnp.sum(rel * rel, axis=-1) + softening**2
    # Reference guards r2 > 0 (only relevant when softening == 0).
    inv_r3 = jnp.where(r2 > 0, r2, 1.0) ** -1.5
    inv_r3 = jnp.where(r2 > 0, inv_r3, 0.0)
    w = inv_r3 * mass[..., None, :, 0]  # [..., i, j]
    return G * jnp.sum(rel * w[..., None], axis=-2)


def leapfrog_step(pos, vel, acc, mass, params: GravityParams):
    """One kick-drift-kick step (``synthetic_sim.py:342-355``)."""
    dt = params.dt
    vel = vel + acc * (dt / 2.0)
    pos = pos + vel * dt
    acc = compute_acceleration(pos, mass, params.interaction_strength, params.softening)
    vel = vel + acc * (dt / 2.0)
    return pos, vel, acc


def sample_initial_conditions(key, n_bodies: int, dim: int = 3, dtype=jnp.float32):
    """Random CoM-frame initial conditions (``synthetic_sim.py:372-381``).

    Positions are scaled by ``cbrt(N/5)`` so density matches the 5-body
    experiment; velocities are standard normal shifted to zero total momentum.
    """
    kp, kv = jax.random.split(key)
    std_dev = (n_bodies / 5.0) ** (1.0 / 3.0)
    pos = jax.random.normal(kp, (n_bodies, dim), dtype) * jnp.asarray(std_dev, dtype)
    vel = jax.random.normal(kv, (n_bodies, dim), dtype)
    mass = jnp.ones((n_bodies, 1), dtype)
    vel = vel - jnp.mean(mass * vel, axis=0) / jnp.mean(mass)
    return pos, vel, mass


@functools.partial(
    jax.jit, static_argnames=("n_bodies", "T", "sample_freq", "params", "dim", "dtype")
)
def sample_trajectory(
    key,
    n_bodies: int,
    T: int = 10000,
    sample_freq: int = 10,
    params: GravityParams = GravityParams(),
    dim: int = 3,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Simulate one trajectory; returns ``(loc, vel, force, mass)``.

    Shapes: ``loc/vel/force [T//sample_freq, N, dim]``, ``mass [N, 1]`` —
    same layout as ``synthetic_sim.py:357-420``.  Frame ``k`` is the state
    after ``k * sample_freq`` integrator sub-steps (the reference saves before
    stepping, ``synthetic_sim.py:401-408``); saved force is ``acc * mass``.
    """
    assert T % sample_freq == 0
    t_save = T // sample_freq
    key, init_key, noise_key = jax.random.split(key, 3)
    pos, vel, mass = sample_initial_conditions(init_key, n_bodies, dim, dtype)
    acc = compute_acceleration(pos, mass, params.interaction_strength, params.softening)

    def substeps(carry, _):
        pos, vel, acc = carry
        frame = (pos, vel, acc * mass)

        def one(c, _):
            p, v, a = c
            p, v, a = leapfrog_step(p, v, a, mass, params)
            return (p, v, a), None

        carry, _ = jax.lax.scan(one, (pos, vel, acc), None, length=sample_freq)
        return carry, frame

    _, (loc_s, vel_s, force_s) = jax.lax.scan(substeps, (pos, vel, acc), None, length=t_save)

    if params.noise_var:
        k1, k2, k3 = jax.random.split(noise_key, 3)
        shp = (t_save, n_bodies, dim)
        loc_s = loc_s + jax.random.normal(k1, shp, dtype) * params.noise_var
        vel_s = vel_s + jax.random.normal(k2, shp, dtype) * params.noise_var
        force_s = force_s + jax.random.normal(k3, shp, dtype) * params.noise_var
    return loc_s, vel_s, force_s, mass


@functools.partial(
    jax.jit,
    static_argnames=("batch_size", "n_bodies", "T", "sample_freq", "params", "dim", "dtype"),
)
def sample_trajectory_batch(
    key,
    batch_size: int,
    n_bodies: int,
    T: int = 10000,
    sample_freq: int = 10,
    params: GravityParams = GravityParams(),
    dim: int = 3,
    dtype=jnp.float32,
):
    """A batch of independent trajectories: ``loc/vel/force [B, T_save, N, d]``,
    ``mass [B, N, 1]``.  One fused XLA program; shard the leading axis over a
    device mesh for multi-chip datagen (see ``parallel.sharded``)."""
    keys = jax.random.split(key, batch_size)
    fn = lambda k: sample_trajectory(k, n_bodies, T, sample_freq, params, dim, dtype)
    return jax.vmap(fn)(keys)


def energies(pos, vel, mass, G, softening):
    """Kinetic / potential / total energy (``synthetic_sim.py:450-473``).

    Args:
      pos, vel: ``[..., N, 3]``; mass: ``[..., N, 1]`` (or broadcastable).
    Returns:
      ``(KE, PE, TE)`` each of shape ``[...]``.
    """
    ke = 0.5 * jnp.sum(mass * vel * vel, axis=(-1, -2))
    rel = pos[..., None, :, :] - pos[..., :, None, :]
    r = jnp.sqrt(jnp.sum(rel * rel, axis=-1) + softening**2)
    inv_r = jnp.where(r > 0, 1.0 / jnp.where(r > 0, r, 1.0), 0.0)
    n = pos.shape[-2]
    iu = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    mm = mass[..., :, 0, None] * mass[..., None, :, 0]
    pe = G * jnp.sum(jnp.where(iu, -mm * inv_r, 0.0), axis=(-1, -2))
    return ke, pe, ke + pe


def energy_series(loc, vel, G, softening):
    """Per-step batch-mean energy time series for rollout scoring.

    Mirrors ``trainer.py:888-927`` (``_compute_nbody_energies``): unit masses,
    per-step KE/PE, averaged over the batch axis.

    Args:
      loc, vel: ``[B, T, N, 3]``.
    Returns:
      dict with ``potential/kinetic/total`` 1-D ``[T]`` float64 numpy arrays.
    """
    import numpy as np

    loc = jnp.asarray(loc)
    vel = jnp.asarray(vel)
    mass = jnp.ones(loc.shape[:-1] + (1,), loc.dtype)
    ke, pe, _ = energies(loc, vel, mass, G, softening)  # [B, T]
    ke = np.asarray(ke, dtype=np.float64).mean(axis=0)
    pe = np.asarray(pe, dtype=np.float64).mean(axis=0)
    return {"potential": pe, "kinetic": ke, "total": pe + ke}
