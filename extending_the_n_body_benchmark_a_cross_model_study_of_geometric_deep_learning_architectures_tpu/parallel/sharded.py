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
