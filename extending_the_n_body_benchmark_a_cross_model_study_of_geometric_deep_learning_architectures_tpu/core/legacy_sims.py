"""Legacy NRI-style simulators: springs and charged particles.

TPU-native ports of ``datasets/nbody/dataset/synthetic_sim.py:12-302``
(``SpringSim`` / ``ChargedParticlesSim``) as ``lax.scan`` programs.  The
reference's Euler-with-clipped-forces integration scheme, initial wall
clamp, force cap ``0.1/dt``, edge/charge sampling distributions and the
``T/sample_freq - 1`` frame layout are preserved; the per-step Python loop
and process-pool fan-out become one fused, vmappable XLA program.

Returned layout matches the reference: ``loc/vel [T_save, dim, N]`` plus the
``[N, N]`` edges (springs) or ``[N, 1]`` charges.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SpringParams(NamedTuple):
    box_size: float = 5.0
    loc_std: float = 0.5
    vel_norm: float = 0.5
    interaction_strength: float = 0.1
    noise_var: float = 0.0
    dt: float = 0.001


class ChargedParams(NamedTuple):
    box_size: float = 5.0
    loc_std: float = 1.0
    vel_norm: float = 0.5
    interaction_strength: float = 1.0
    noise_var: float = 0.0
    dt: float = 0.001


def _clamp(loc, vel, box):
    """Elastic wall reflection (``synthetic_sim.py:42-65``)."""
    over = loc > box
    loc = jnp.where(over, 2 * box - loc, loc)
    vel = jnp.where(over, -jnp.abs(vel), vel)
    under = loc < -box
    loc = jnp.where(under, -2 * box - loc, loc)
    vel = jnp.where(under, jnp.abs(vel), vel)
    return loc, vel


def _pair_force(loc, forces_size, max_f):
    """F_i = sum_j forces_size[i, j] * (r_i - r_j), per-component capped."""
    rel = loc[:, None, :] - loc[None, :, :]  # [N, N, d]
    F = jnp.sum(forces_size[..., None] * rel, axis=1)
    return jnp.clip(F, -max_f, max_f)


def _simulate(loc0, vel0, forces_size_fn, params, T, sample_freq, key, dim, n):
    """Shared Euler loop, frame-exact to ``synthetic_sim.py:103-152``: after
    an initial kick ``vel += dt*F(loc0)``, each iteration i in 1..T-1 drifts
    ``loc += dt*vel``, *then* saves ``(loc, vel)`` when ``i % freq == 0``
    (vel at the save point has NOT yet received this iteration's kick), then
    kicks ``vel += dt*F(loc)``.  Saves land at i = freq..T-freq — note the
    reference initialises ``loc[0]`` with the clamped initial state but its
    save counter starts at 0, so the first save *overwrites* it
    (``synthetic_sim.py:103,129-131``); the initial frame never appears in
    the output.  T_save = T/freq - 1 frames total."""
    max_f = 0.1 / params.dt
    t_save = T // sample_freq - 1

    vel = vel0 + params.dt * _pair_force(loc0, forces_size_fn(loc0), max_f)

    def one(c, _):
        loc, vel = c
        loc = loc + params.dt * vel
        F = _pair_force(loc, forces_size_fn(loc), max_f)
        vel = vel + params.dt * F
        return (loc, vel), None

    def block(carry, _):
        # freq-1 full drift+kick iterations, then the save iteration split
        # around its save point: drift -> save (loc, pre-kick vel) -> kick
        (loc, vel), _ = jax.lax.scan(one, carry, None, length=sample_freq - 1)
        loc = loc + params.dt * vel
        frame = (loc, vel)
        F = _pair_force(loc, forces_size_fn(loc), max_f)
        vel = vel + params.dt * F
        return (loc, vel), frame

    (_, _), (locs, vels) = jax.lax.scan(block, (loc0, vel), None, length=t_save)

    if params.noise_var:
        k1, k2 = jax.random.split(key)
        locs = locs + jax.random.normal(k1, locs.shape, locs.dtype) * params.noise_var
        vels = vels + jax.random.normal(k2, vels.shape, vels.dtype) * params.noise_var
    # reference layout [T_save, dim, N]
    return jnp.swapaxes(locs, 1, 2), jnp.swapaxes(vels, 1, 2)


@functools.partial(
    jax.jit, static_argnames=("n_balls", "T", "sample_freq", "params", "dim")
)
def sample_spring_trajectory(
    key,
    n_balls: int = 5,
    T: int = 10000,
    sample_freq: int = 10,
    params: SpringParams = SpringParams(),
    dim: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns ``(loc, vel, edges)``; spring constants sampled from
    {0, 0.5, 1} with prob (0.5, 0, 0.5), symmetrised, zero diagonal."""
    k_e, k_l, k_v, k_n = jax.random.split(key, 4)
    spring_types = jnp.asarray([0.0, 0.5, 1.0])
    probs = jnp.asarray([0.5, 0.0, 0.5])
    idx = jax.random.choice(k_e, 3, (n_balls, n_balls), p=probs)
    edges = spring_types[idx]
    edges = jnp.tril(edges) + jnp.tril(edges, -1).T
    edges = edges * (1.0 - jnp.eye(n_balls))

    loc0 = jax.random.normal(k_l, (n_balls, dim)) * params.loc_std
    vel0 = jax.random.normal(k_v, (n_balls, dim))
    vel0 = vel0 * params.vel_norm / jnp.linalg.norm(vel0, axis=-1, keepdims=True)
    loc0, vel0 = _clamp(loc0, vel0, params.box_size)

    forces = lambda loc: -params.interaction_strength * edges
    loc, vel = _simulate(
        loc0, vel0, forces, params, T, sample_freq, k_n, dim, n_balls
    )
    return loc, vel, edges


@functools.partial(
    jax.jit, static_argnames=("n_balls", "T", "sample_freq", "params", "dim")
)
def sample_charged_trajectory(
    key,
    n_balls: int = 5,
    T: int = 10000,
    sample_freq: int = 10,
    params: ChargedParams = ChargedParams(),
    dim: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns ``(loc, vel, edges, charges)``; charges ±1 with prob 1/2,
    Coulomb ``q_i q_j / r^3`` force kernel with per-component cap
    (``synthetic_sim.py:226-302``), density-scaled ``loc_std`` (``:161``)."""
    k_c, k_l, k_v, k_n = jax.random.split(key, 4)
    charge_types = jnp.asarray([-1.0, 0.0, 1.0])
    probs = jnp.asarray([0.5, 0.0, 0.5])
    charges = charge_types[jax.random.choice(k_c, 3, (n_balls, 1), p=probs)]
    edges = charges @ charges.T

    loc_std = params.loc_std * (n_balls / 5.0) ** (1.0 / 3.0)
    loc0 = jax.random.normal(k_l, (n_balls, dim)) * loc_std
    vel0 = jax.random.normal(k_v, (n_balls, dim))
    vel0 = vel0 * params.vel_norm / jnp.linalg.norm(vel0, axis=-1, keepdims=True)
    loc0, vel0 = _clamp(loc0, vel0, params.box_size)

    def forces(loc):
        rel = loc[:, None, :] - loc[None, :, :]
        r2 = jnp.sum(rel * rel, axis=-1)
        inv_r3 = jnp.where(r2 > 0, jnp.where(r2 > 0, r2, 1.0) ** -1.5, 0.0)
        fs = params.interaction_strength * edges * inv_r3
        return fs * (1.0 - jnp.eye(n_balls))

    loc, vel = _simulate(
        loc0, vel0, forces, params, T, sample_freq, k_n, dim, n_balls
    )
    return loc, vel, edges, charges


def sample_spring_batch(key, batch_size, **kw):
    return jax.vmap(lambda k: sample_spring_trajectory(k, **kw))(
        jax.random.split(key, batch_size)
    )


def sample_charged_batch(key, batch_size, **kw):
    return jax.vmap(lambda k: sample_charged_trajectory(k, **kw))(
        jax.random.split(key, batch_size)
    )
