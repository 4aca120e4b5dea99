"""Ring-sharded pairwise force computation for big-N systems.

SURVEY.md §5.7: all reference models and the gravity integrator are O(N²)
through dense pairwise interactions; the reference scales N only within one
GPU's memory.  The TPU-native scaling axis is a ``body``-sharded ring — the
N-body analogue of ring attention with a distance kernel instead of softmax:

* each device owns a block of ``N/D`` bodies (positions + masses),
* at each of ``D`` ring steps every device accumulates the acceleration
  contribution of the *visiting* source block on its *resident* receiver
  block, then forwards the source block to its ring neighbour with
  ``lax.ppermute`` over ICI,
* after ``D`` steps every receiver has summed over all N sources; peak
  memory per device is O(N²/D²) for the pairwise block instead of O(N²).

Physics matches ``core.physics.compute_acceleration``
(``synthetic_sim.py:318-340``): softened 1/r³ kernel with the r²>0 self-pair
guard (exact-coincidence pairs contribute zero, which also silences the
diagonal when a block visits itself).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.physics import GravityParams
from .mesh import BODY_AXIS


def _block_acceleration(dst_pos, src_pos, src_mass, G: float, softening: float):
    """Acceleration of ``dst`` receivers due to ``src`` sources.

    dst_pos ``[..., Nd, 3]``; src_pos ``[..., Ns, 3]``; src_mass
    ``[..., Ns, 1]``.  Same guarded-softened kernel as
    ``core.physics.compute_acceleration``.
    """
    rel = src_pos[..., None, :, :] - dst_pos[..., :, None, :]  # [.., Nd, Ns, 3]
    r2 = jnp.sum(rel * rel, axis=-1)
    inv_r3 = jnp.where(r2 > 0.0, (r2 + softening**2) ** -1.5, 0.0)
    w = inv_r3 * src_mass[..., None, :, 0]  # [.., Nd, Ns]
    return G * jnp.einsum("...ds,...dsk->...dk", w, rel)


def make_ring_acceleration(mesh: Mesh, params: GravityParams):
    """Returns a jitted ``(pos [..., N, 3], mass [..., N, 1]) -> acc`` with
    the body axis sharded over ``mesh``'s ``body`` dimension.

    Works for single systems ``[N, 3]`` or batches ``[B, N, 3]`` (batch
    replicated or ``sim``-sharded by the caller's input shardings).
    """
    D = mesh.shape[BODY_AXIS]
    G_, soft = params.interaction_strength, params.softening
    perm = [(j, (j + 1) % D) for j in range(D)]

    def local(pos_blk, mass_blk):
        # pos_blk [..., N/D, 3] resident; loop carries the visiting block
        def body(_, carry):
            acc, src_pos, src_mass = carry
            acc = acc + _block_acceleration(pos_blk, src_pos, src_mass, G_, soft)
            src_pos = jax.lax.ppermute(src_pos, BODY_AXIS, perm)
            src_mass = jax.lax.ppermute(src_mass, BODY_AXIS, perm)
            return acc, src_pos, src_mass

        acc0 = jnp.zeros_like(pos_blk)
        acc, _, _ = jax.lax.fori_loop(0, D, body, (acc0, pos_blk, mass_blk))
        return acc

    @functools.partial(jax.jit)
    def ring_acc(pos, mass):
        nd = pos.ndim
        spec_pos = P(*([None] * (nd - 2)), BODY_AXIS, None)
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(spec_pos, spec_pos),
            out_specs=spec_pos,
        )
        return fn(pos, mass)

    return ring_acc
