"""Target-spec semantics shared by losses and rollout.

The reference supports six target specs (``dataset_gravity_otf.py:216-239``)
but hard-codes ``pos_dt+vel`` decode semantics everywhere downstream: its
auxiliary losses read ``data.pos + pred[..., :3]`` / ``pred[..., 3:]``
unconditionally (``training/losses.py:64-67,99-103``) and its rollout only
special-cases ``pos_dt+vel`` integration (``infer_self_feed.py:185-186``) —
so training or rolling out with any other 6-dim target silently produces
garbage there.  This module centralizes the decode so every consumer agrees
on what a prediction/target array *means*.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

TARGETS = ("pos", "force", "pos_dt+vel_dt", "pos_dt+vel", "pos+vel", "pos_com+vel")

#: targets that encode a (next_pos, next_vel) pair and can close a
#: self-feed loop; ``pos``/``force`` are 3-dim and carry no velocity channel
SELF_FEEDABLE = tuple(t for t in TARGETS if t not in ("pos", "force"))


def decode_next_state(
    arr: jnp.ndarray,
    pos: jnp.ndarray,
    vel: jnp.ndarray,
    target: str,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Decode a prediction/target ``arr [..., N, 3|6]`` into the absolute
    next ``(pos, vel)`` it encodes under ``target`` semantics.

    ``pos``/``vel`` are the *current* state the deltas are relative to.
    Returns ``(next_pos, next_vel)``; ``next_vel`` is None for the 3-dim
    ``pos`` target.  ``force`` encodes no next state and raises.
    """
    if target == "force":
        raise ValueError("target 'force' does not encode a next state")
    p = arr[..., :3]
    if target.startswith("pos_dt"):
        next_pos = pos + p
    elif target.startswith("pos_com"):
        # built relative to the input frame's unweighted CoM
        # (dataset_gravity_otf.py:234-236)
        next_pos = p + jnp.mean(pos, axis=-2, keepdims=True)
    else:
        next_pos = p
    if arr.shape[-1] < 6:
        return next_pos, None
    v = arr[..., 3:6]
    next_vel = vel + v if target.endswith("vel_dt") else v
    return next_pos, next_vel
