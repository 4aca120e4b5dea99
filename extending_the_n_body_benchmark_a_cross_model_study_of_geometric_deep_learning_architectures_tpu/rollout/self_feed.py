"""Self-feed rollout: the model eats its own predictions for ~1000 steps.

TPU-native re-design of ``helper_scripts/infer_self_feed.py:run_inference``.
The reference loops in Python — rebuilding a PyG graph per step and calling
the model ~1000 times with host round-trips (``infer_self_feed.py:99-181``).
Here the *entire* rollout (graph build + featurize + model + pos_dt
integration + explosion guard) is one jitted ``lax.scan``, so a checkpoint
evaluation is a single device program.  This is where the >=10x speedup over
the GH200 baseline comes from (BASELINE.md north-star metric).

Explosion handling: the reference's generic path restarts the rollout a few
steps back when ``|pred| > 1e9`` and raises ``SelfFeedError(steps_survived)``
after 20 tries (``self_feed.py:26-39,328-359``).  A data-dependent rollback
is scan-hostile, so we keep the *semantics* (a diverged sim stops evolving
and we report how many steps survived) with a per-sim freeze mask: once a
simulation exceeds the threshold its state stops updating, and
``steps_survived`` reports the first explosion step (min over sims), exactly
the quantity the trainer logs (``trainer.py:1040-1047``).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import graph as G
from ..core.scene import Scene
from ..core.targets import decode_next_state

EXPLOSION_THRESHOLD = 1e9  # self_feed.py:26


def make_rollout_fn(
    model,
    num_steps: int,
    num_neighbors: Optional[int] = None,
    target: str = "pos_dt+vel",
    explosion_threshold: float = EXPLOSION_THRESHOLD,
    matmul_precision: Optional[str] = None,
    train_mode: bool = False,
):
    """Build a jitted rollout: ``fn(params, scene0[, rng]) -> (loc, vel, survived)``.

    Args:
      model: flax module with ``apply(params, scene, mask) -> [B,N,3k]``.
      num_steps: total saved frames T (the rollout runs T-1 model calls,
        matching ``infer_self_feed.py:99``).
      num_neighbors: KNN degree; ``None`` means fully connected, the
        reference's rollout default (``infer_self_feed.py:58``).
      matmul_precision: optional jax matmul precision for the rollout trace
        (e.g. ``"float32"``).  TPU f32 matmuls default to one-pass bf16
        multiplication; over ~1000 closed-loop steps that noise compounds —
        the reference rolls out in f64 (``config.yaml:177``), so
        precision-sensitive models (EquiformerV2) need true-f32 here.
      train_mode: roll out with the model in *training* mode (dropout etc.
        active), drawing fresh dropout noise every step.  This reproduces the
        reference, whose ``run_inference`` uses ``@torch.no_grad()`` but never
        calls ``model.eval()`` — the trainer leaves the model in ``.train()``
        from the preceding epoch (``trainer.py:373`` sets train, the only
        ``eval()`` is ``:410`` in validation which runs *after* self-feed at
        ``:1037`` vs ``:1058``).  For models with live dropout (EquiformerV2:
        alpha_drop 0.1 + drop_path 0.05; GraphTransformer: encoder dropout
        0.1) the reference's published rollouts are therefore stochastic;
        deterministic rollout is a behavioral deviation.  When True the
        returned fn takes an extra ``rng`` argument.
    Returns:
      ``loc, vel`` of shape ``[B, T, N, 3]`` (frame 0 = initial state) and
      ``survived [B]`` int32 per-sim surviving step counts.
    """
    # Target-aware state integration.  The reference only special-cases
    # ``pos_dt+vel`` (``infer_self_feed.py:185-186``) and silently
    # mis-integrates the other trainable targets (``vel_dt`` deltas fed back
    # as absolute velocities, ``pos_com`` never re-offset); here every
    # 6-dim target rolls out with its actual semantics and the 3-dim
    # targets (``pos``, ``force``) are rejected loudly — they carry no
    # velocity channel, so a self-feed rollout is undefined for them.
    if target in ("pos", "force"):
        raise ValueError(
            f"target {target!r} is not self-feedable: the model predicts no "
            "velocity channel to close the loop with (the reference crashes "
            "on these too — infer_self_feed.py:183-186)"
        )

    @jax.jit
    def rollout(params, scene0: Scene, rng=None):
        if matmul_precision:
            ctx = jax.default_matmul_precision(matmul_precision)
        else:
            ctx = contextlib.nullcontext()
        with ctx:
            return _rollout_body(params, scene0, rng)

    def _rollout_body(params, scene0: Scene, rng):
        n = scene0.pos.shape[1]
        k = num_neighbors if (num_neighbors and 0 < num_neighbors < n) else n - 1
        mass = scene0.mass
        zero_force = jnp.zeros_like(scene0.pos)

        # the reference seeds the first model call with the GT frame-0 force
        # and zeros thereafter ("force is not predicted",
        # infer_self_feed.py:63-68,189-191) — carry the force so step 0 sees
        # scene0.force and every later step sees zeros
        if train_mode and rng is None:
            rng = jax.random.PRNGKey(0)

        def step(carry, _):
            if train_mode:
                pos, vel, force, frozen, key = carry
                key, sub = jax.random.split(key)
            else:
                pos, vel, force, frozen = carry
            mask = G.knn_mask(pos, k)
            scene = Scene(pos=pos, vel=vel, force=force, mass=mass)
            if train_mode:
                out = model.apply(params, scene, mask, True, rngs={"dropout": sub})
            else:
                out = model.apply(params, scene, mask)
            new_pos, new_vel = decode_next_state(out, pos, vel, target)
            bad = jnp.any(
                (jnp.abs(new_pos) > explosion_threshold)
                | ~jnp.isfinite(new_pos)
                | ~jnp.isfinite(new_vel),
                axis=(1, 2),
            )
            frozen = frozen | bad
            keep = frozen[:, None, None]
            new_pos = jnp.where(keep, pos, new_pos)
            new_vel = jnp.where(keep, vel, new_vel)
            new_carry = (
                (new_pos, new_vel, zero_force, frozen, key)
                if train_mode
                else (new_pos, new_vel, zero_force, frozen)
            )
            return new_carry, (new_pos, new_vel, frozen)

        frozen0 = jnp.zeros(scene0.pos.shape[0], dtype=bool)
        carry0 = (
            (scene0.pos, scene0.vel, scene0.force, frozen0, rng)
            if train_mode
            else (scene0.pos, scene0.vel, scene0.force, frozen0)
        )
        _, (locs, vels, frozens) = jax.lax.scan(
            step, carry0, None, length=num_steps - 1
        )
        loc = jnp.concatenate([scene0.pos[None], locs], axis=0).swapaxes(0, 1)
        vel = jnp.concatenate([scene0.vel[None], vels], axis=0).swapaxes(0, 1)
        survived = jnp.sum(~frozens, axis=0).astype(jnp.int32)  # [B]
        return loc, vel, survived

    return rollout


# flax modules are frozen dataclasses (hashable), so repeated checkpoint
# evaluations of the same model/shape reuse one jitted rollout instead of
# re-tracing every eval (the trainer calls this every test_macros_every)
_cached_rollout_fn = functools.lru_cache(maxsize=8)(make_rollout_fn)


def run_self_feed(
    model,
    params,
    dataset,
    num_steps: Optional[int] = None,
    num_neighbors: Optional[int] = None,
    batch_size: Optional[int] = None,
    mesh=None,
    matmul_precision: Optional[str] = None,
    train_mode: bool = False,
    rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, int]:
    """Full checkpoint evaluation rollout against fresh ground truth.

    Mirrors ``run_inference`` (``infer_self_feed.py:20-254``): draw fresh GT
    trajectories, seed the model with frame 0, roll forward T-1 steps.

    Returns ``(loc_actual, vel_actual, loc_pred, vel_pred, steps_survived)``
    with ``loc/vel`` of shape ``[B, T, N, 3]``.
    """
    loc_gt, vel_gt, force_gt, mass = dataset.get_ground_truth_trajectories(batch_size)
    T = int(loc_gt.shape[1])
    if num_steps is not None and 0 < num_steps < T:
        T = num_steps
        loc_gt, vel_gt = loc_gt[:, :T], vel_gt[:, :T]
    scene0 = Scene(
        pos=loc_gt[:, 0], vel=vel_gt[:, 0], force=force_gt[:, 0], mass=mass
    )
    fn = _cached_rollout_fn(
        model,
        T,
        num_neighbors=num_neighbors,
        target=dataset.target,
        matmul_precision=matmul_precision,
        train_mode=train_mode,
    )
    if mesh is not None and scene0.pos.shape[0] % mesh.devices.size == 0:
        from ..parallel.sharded import shard_scene

        scene0 = shard_scene(scene0, mesh)
    if train_mode:
        loc_pred, vel_pred, survived = fn(
            params, scene0, rng if rng is not None else jax.random.PRNGKey(0)
        )
    else:
        loc_pred, vel_pred, survived = fn(params, scene0)
    return loc_gt, vel_gt, loc_pred, vel_pred, int(survived.min())
