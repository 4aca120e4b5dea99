"""Optimizer + Noam LR schedule, matching ``trainer.py:170-213``.

* AdamW(lr, betas=(0.9, 0.98), eps=1e-9, weight_decay=1e-8)
* LR multiplier: ``factor * size^-0.5 * min(step^-0.5, step * warmup^-1.5)``
  with ``step==0`` treated as 1 (``trainer.py:189-195``).
* Optional clip-by-value and clip-by-global-norm before the optimizer
  (``trainer.py:197-205``), and NaN-gradient discarding
  (``trainer.py:207-213``) via ``optax.apply_if_finite``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def noam_schedule(learning_rate: float, model_size: int, factor: float, warmup: int):
    def schedule(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        mult = factor * (model_size ** -0.5) * jnp.minimum(s**-0.5, s * warmup**-1.5)
        return learning_rate * mult

    return schedule


def create_optimizer(
    learning_rate: float,
    model_size: int,
    factor: float = 1.0,
    warmup: int = 1000,
    clip_value: Optional[float] = None,
    clip_norm: Optional[float] = None,
    discard_nan_gradients: bool = False,
    weight_decay: float = 1e-8,
) -> optax.GradientTransformation:
    parts = []
    if clip_value is not None:
        parts.append(optax.clip(clip_value))
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(
        optax.adamw(
            learning_rate=noam_schedule(learning_rate, model_size, factor, warmup),
            b1=0.9,
            b2=0.98,
            eps=1e-9,
            weight_decay=weight_decay,
        )
    )
    tx = optax.chain(*parts)
    if discard_nan_gradients:
        # Skip the whole update (and do not advance the schedule) on any
        # non-finite gradient, like Trainer._gradient_isnan + early return.
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10**9)
    return tx
