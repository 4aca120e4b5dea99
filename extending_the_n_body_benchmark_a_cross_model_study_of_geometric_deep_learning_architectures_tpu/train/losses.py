"""Training losses — pure-jnp ports of ``training/losses.py``.

All losses take ``(pred [B,N,3k], scene, y [B,N,3k])`` and return a scalar.
MSE means over every element, like ``torch.nn.MSELoss`` default reduction.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax.numpy as jnp

from ..core.physics import energies
from ..core.scene import Scene
from ..core.targets import decode_next_state


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a - b
    return jnp.mean(d * d)


def target_common_loss(
    pred: jnp.ndarray,
    scene: Scene,
    y: jnp.ndarray,
    targets: Sequence[str],
    weights: Dict[str, float],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted per-3-slice MSE (``training/losses.py:22-45``).

    Weight lookup mirrors the construction order: position / velocity / force
    weights keyed by target component family.
    """
    total = 0.0
    terms: Dict[str, jnp.ndarray] = {}
    for i, t in enumerate(targets):
        sl = mse(pred[..., 3 * i : 3 * (i + 1)], y[..., 3 * i : 3 * (i + 1)])
        # the reference matches by substring on the whole target spec
        # ("pos" in args.target — losses.py:28-37), so pos_com is a
        # Position-weighted term there too
        if t.startswith("pos"):
            w, name = weights.get("position", 1.0), "Position loss"
        elif t in ("vel", "vel_dt"):
            w, name = weights.get("velocity", 1.0), "Velocity loss"
        else:
            w, name = weights.get("force", 1.0), "Force loss"
        terms[name] = w * sl
        total = total + w * sl
    return total, terms


def centre_of_mass_loss(pred, scene: Scene, y, weight: float = 1.0,
                        target: str = "pos_dt+vel"):
    """CoM MSE between predicted and true next positions
    (``training/losses.py:48-84``) — dense mean over the body axis.

    Deviation: the reference hard-codes ``data.pos + pred[..., :3]``
    (``losses.py:64-67``), which is only correct for ``pos_dt`` targets;
    here the next positions are decoded per the actual target spec.
    """
    pos_pred, _ = decode_next_state(pred, scene.pos, scene.vel, target)
    pos_true, _ = decode_next_state(y, scene.pos, scene.vel, target)
    com_pred = jnp.mean(pos_pred, axis=1)
    com_true = jnp.mean(pos_true, axis=1)
    return weight * mse(com_pred, com_true)


def momentum_loss(pred, scene: Scene, y, weight: float = 0.0001,
                  target: str = "pos_dt+vel"):
    """Frame-to-frame momentum conservation penalty
    (``training/losses.py:131-241``): MSE(total predicted momentum,
    total current momentum) per simulation.  The predicted next velocity is
    decoded per the target spec (the reference reads ``pred[..., 3:]``
    unconditionally, wrong for ``vel_dt`` targets)."""
    _, vel_pred = decode_next_state(pred, scene.pos, scene.vel, target)
    mom_cur = jnp.sum(scene.mass * scene.vel, axis=1)  # [B,3]
    mom_pred = jnp.sum(scene.mass * vel_pred, axis=1)
    return weight * mse(mom_pred, mom_cur)


def energy_loss(pred, scene: Scene, y, G: float, softening: float,
                weight: float = 1.0, target: str = "pos_dt+vel"):
    """Energy MSE between predicted and target next states
    (``training/losses.py:87-128``) — computed on-device instead of the
    reference's host NumPy round-trip, with target-aware state decode."""
    pos_pred, vel_pred = decode_next_state(pred, scene.pos, scene.vel, target)
    pos_true, vel_true = decode_next_state(y, scene.pos, scene.vel, target)
    _, _, te_pred = energies(pos_pred, vel_pred, scene.mass, G, softening)
    _, _, te_true = energies(pos_true, vel_true, scene.mass, G, softening)
    return weight * mse(te_pred, te_true)


def build_loss_fn(args) -> Callable:
    """Compose the loss stack like ``Trainer.initialize_losses``
    (``trainer.py:155-168``).  ``args`` is the flat config namespace."""
    targets = args.target.split("+")
    weights = {
        "position": getattr(args, "position_loss_weight", 1.0),
        "velocity": getattr(args, "velocity_loss_weight", 1.0),
        "force": getattr(args, "force_loss_weight", 1.0),
    }
    use_com = getattr(args, "com_loss", False)
    use_energy = getattr(args, "energy_loss", False)
    use_momentum = getattr(args, "momentum_loss", False)
    momentum_w = getattr(args, "momentum_loss_weight", 0.0001)
    G = getattr(args, "interaction_strength", 2.0)
    soft = getattr(args, "softening", 0.2)

    # momentum/energy losses read pred[..., 3:6] as a velocity — fail at
    # build time with a clear message for single-component targets like
    # target='pos' instead of a broadcast error at jit trace time
    if (use_energy or use_momentum) and len(targets) < 2:
        raise ValueError(
            f"energy_loss/momentum_loss need a velocity component in the "
            f"prediction (target={args.target!r} has only {targets})"
        )
    if use_com and args.target == "force":
        raise ValueError("com_loss is undefined for target='force' "
                         "(the prediction encodes no position state)")

    target_spec = args.target

    def loss_fn(pred, scene, y):
        total, terms = target_common_loss(pred, scene, y, targets, weights)
        terms["Total target loss"] = total
        if use_com:
            l = centre_of_mass_loss(pred, scene, y, target=target_spec)
            terms["Centre of mass loss"] = l
            total = total + l
        if use_energy:
            l = energy_loss(pred, scene, y, G, soft, target=target_spec)
            terms["Energy loss"] = l
            total = total + l
        if use_momentum:
            l = momentum_loss(pred, scene, y, momentum_w, target=target_spec)
            terms["Momentum loss"] = l
            total = total + l
        return total, terms

    return loss_fn


def dynamic_weighted_loss_init() -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Initial EMA state (running pos/vel losses start at 1.0)."""
    return jnp.asarray(1.0), jnp.asarray(1.0)


def dynamic_weighted_loss(
    pred: jnp.ndarray,
    y: jnp.ndarray,
    state: Tuple[jnp.ndarray, jnp.ndarray],
    alpha: float = 0.99,
):
    """EMA-balanced pos/vel MSE
    (``models/equiformer_v2/architecture/dynamic_weighted_loss.py:5-31`` —
    defined but never wired up in the reference; provided here as a pure
    function with explicit EMA state for jit-compatible threading).

    Returns ``(loss, new_state)``; each target is weighted by the *other*
    target's share of the running loss, so the slower-converging term gets
    up-weighted.
    """
    import jax

    run_pos, run_vel = state
    loss_pos = mse(pred[..., :3], y[..., :3])
    loss_vel = mse(pred[..., 3:6], y[..., 3:6])
    new_pos = alpha * run_pos + (1 - alpha) * jax.lax.stop_gradient(loss_pos)
    new_vel = alpha * run_vel + (1 - alpha) * jax.lax.stop_gradient(loss_vel)
    total_run = new_pos + new_vel
    loss = (new_vel / total_run) * loss_pos + (new_pos / total_run) * loss_vel
    return loss, (new_pos, new_vel)


def percentage_errors(pred, y, targets: List[str]) -> Dict[str, jnp.ndarray]:
    """Per-target relative L2 error in percent (``trainer.py:480-490``)."""
    out = {}
    for i, t in enumerate(targets):
        err = pred[..., 3 * i : 3 * (i + 1)] - y[..., 3 * i : 3 * (i + 1)]
        err_l2 = jnp.linalg.norm(err, axis=-1)
        tgt_l2 = jnp.linalg.norm(y[..., 3 * i : 3 * (i + 1)], axis=-1)
        out[f"{t}_perc_error"] = jnp.mean(err_l2 / (tgt_l2 + 1e-12)) * 100.0
    return out
