"""Multi-chip train / datagen / rollout via ``jit`` + ``NamedSharding``.

Replaces the reference's host-side process pools (SURVEY.md §2 parallelism):
datagen fans out over the ``sim`` mesh axis instead of OS workers
(``dataset_gravity_otf.py:96-104``), and the training batch of independent
simulations shards over ICI.  Parameters and optimizer state are replicated;
gradients are reduced by XLA-inserted ``psum`` collectives — no NCCL/MPI
analogue code, just shardings.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..core import graph as G
from ..core.physics import GravityParams, sample_trajectory_batch
from ..core.scene import Scene
from .mesh import replicate, scene_sharding


def shard_scene(scene: Scene, mesh: Mesh, shard_bodies: bool = False) -> Scene:
    """Place a scene's arrays on the mesh (batch over ``sim`` axis)."""
    sh = scene_sharding(mesh, shard_bodies)
    put = lambda x: jax.device_put(x, sh) if x is not None else None
    return Scene(
        pos=put(scene.pos),
        vel=put(scene.vel),
        force=put(scene.force),
        mass=put(scene.mass),
        charge=put(scene.charge),
    )


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn,
    num_neighbors: int,
    mesh: Mesh,
    shard_bodies: bool = False,
    charged: bool = False,
):
    """Jitted multi-chip train step.

    Inputs: batch arrays sharded over ``sim`` (+ optionally ``body``); params
    and optimizer state replicated.  The loss mean over the batch makes XLA
    emit a ``psum`` of local partial gradients over ICI — data parallelism
    without a single explicit collective in user code.
    """
    data_sh = scene_sharding(mesh, shard_bodies)
    repl = replicate(mesh)

    def step(params, opt_state, scene: Scene, y, rng):
        def lf(p):
            mask = G.knn_mask(scene.pos, num_neighbors)
            pred = model.apply(p, scene, mask, train=True, rngs={"dropout": rng})
            total, _ = loss_fn(pred, scene, y)
            return total

        loss, grads = jax.value_and_grad(lf)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, loss

    # charge is an optional Scene field: the shardings pytree must match the
    # argument's structure (charge=None vs charge=[B,N,1] array), so callers
    # training on the offline charged dataset pass charged=True.
    scene_shardings = Scene(
        pos=data_sh, vel=data_sh, force=data_sh, mass=data_sh,
        charge=data_sh if charged else None,
    )
    return jax.jit(
        step,
        in_shardings=(repl, repl, scene_shardings, data_sh, repl),
        out_shardings=(repl, repl, repl),
    )


def sharded_datagen(
    key,
    mesh: Mesh,
    batch_size: int,
    n_bodies: int,
    T: int = 10000,
    sample_freq: int = 10,
    params: GravityParams = GravityParams(),
    dtype=jnp.float32,
):
    """Trajectory datagen sharded over the ``sim`` axis: each chip integrates
    its slice of the batch; results stay distributed for sharded training."""
    sh = scene_sharding(mesh)

    def gen(k):
        return sample_trajectory_batch(
            k, batch_size=batch_size, n_bodies=n_bodies, T=T,
            sample_freq=sample_freq, params=params, dtype=dtype,
        )

    loc, vel, force, mass = jax.jit(
        gen, out_shardings=(sh, sh, sh, sh)
    )(key)
    return loc, vel, force, mass


def make_body_ring_rollout_fn(
    model,
    num_steps: int,
    mesh: Mesh,
    target: str = "pos_dt+vel",
    explosion_threshold: float = 1e9,
):
    """Self-feed rollout with the BODY axis sharded over the mesh — the
    big-N path (SURVEY §5.7): every ``[B, N, N, ·]`` edge tensor lives as
    ``[B, N/D, N/D, ·]`` per-device blocks via the ring message pass
    (``parallel/ring_egnn.py``), so peak memory scales O(N²/D²) and N can
    grow past a single chip's dense limit.

    ``model`` must be an EGNN-MC with ``body_ring=True`` (fully-connected
    graphs, the reference rollout default).  Semantics mirror
    ``rollout.self_feed.make_rollout_fn``: explosion freeze (the reference's
    ``self_feed.py:26-39`` restart redesign) with the per-sim divergence
    test reduced globally over body shards, ``survived`` counts per sim.

    2-D parallelism comes for free: when the mesh has a non-trivial ``sim``
    axis the batch shards over it (data parallel) while bodies ring over
    ``body`` — each sim shard runs its own ring on its row of the mesh.

    Returns ``fn(params, scene0) -> (loc [B,T,N,3], vel [B,T,N,3],
    survived [B])`` with loc/vel body-sharded on their last-but-one axis.
    """
    from jax.sharding import PartitionSpec as P

    from ..core.targets import decode_next_state
    from .mesh import BODY_AXIS, SIM_AXIS

    def local_rollout(params, pos0, vel0, force0, mass):
        zero_force = jnp.zeros_like(pos0)

        def step(carry, _):
            pos, vel, force, frozen = carry
            scene = Scene(pos=pos, vel=vel, force=force, mass=mass)
            out = model.apply(params, scene, None)  # mask unused: FC ring
            new_pos, new_vel = decode_next_state(out, pos, vel, target)
            bad_local = jnp.any(
                (jnp.abs(new_pos) > explosion_threshold)
                | ~jnp.isfinite(new_pos)
                | ~jnp.isfinite(new_vel),
                axis=(1, 2),
            )
            # a sim diverges if ANY of its body shards did
            bad = jax.lax.psum(bad_local.astype(jnp.int32), BODY_AXIS) > 0
            frozen = frozen | bad
            keep = frozen[:, None, None]
            new_pos = jnp.where(keep, pos, new_pos)
            new_vel = jnp.where(keep, vel, new_vel)
            return (new_pos, new_vel, zero_force, frozen), (
                new_pos, new_vel, frozen,
            )

        frozen0 = jnp.zeros(pos0.shape[0], dtype=bool)
        _, (locs, vels, frozens) = jax.lax.scan(
            step, (pos0, vel0, force0, frozen0), None, length=num_steps - 1
        )
        loc = jnp.concatenate([pos0[None], locs], axis=0).swapaxes(0, 1)
        vel = jnp.concatenate([vel0[None], vels], axis=0).swapaxes(0, 1)
        survived = jnp.sum(~frozens, axis=0).astype(jnp.int32)  # [B]
        return loc, vel, survived

    # [B, N, ...]: sims over the data-parallel axis, bodies over the ring
    body = P(SIM_AXIS, BODY_AXIS)
    fn = jax.shard_map(
        local_rollout,
        mesh=mesh,
        in_specs=(P(), body, body, body, body),
        out_specs=(
            P(SIM_AXIS, None, BODY_AXIS),
            P(SIM_AXIS, None, BODY_AXIS),
            P(SIM_AXIS),
        ),
        check_vma=False,  # params replicated; frozen identical on body shards
    )
    return jax.jit(
        lambda params, scene0: fn(
            params, scene0.pos, scene0.vel, scene0.force, scene0.mass
        )
    )


def make_sharded_rollout_fn(
    model,
    num_steps: int,
    mesh: Mesh,
    num_neighbors: Optional[int] = None,
    target: str = "pos_dt+vel",
    charged: bool = False,
):
    """Self-feed rollout with the batch of sims sharded over the mesh —
    checkpoint evaluation at full-fleet throughput."""
    from ..rollout.self_feed import make_rollout_fn

    inner = make_rollout_fn(model, num_steps, num_neighbors, target)
    data_sh = scene_sharding(mesh)
    repl = replicate(mesh)
    scene_shardings = Scene(
        pos=data_sh, vel=data_sh, force=data_sh, mass=data_sh,
        charge=data_sh if charged else None,
    )
    return jax.jit(
        lambda params, scene0: inner(params, scene0),
        in_shardings=(repl, scene_shardings),
        out_shardings=(data_sh, data_sh, data_sh),
    )
