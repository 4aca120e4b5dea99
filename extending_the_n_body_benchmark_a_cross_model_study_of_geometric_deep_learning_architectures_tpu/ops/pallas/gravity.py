"""Fused pairwise softened-gravity acceleration as a Pallas TPU kernel.

The integrator's hot op (``core.physics.compute_acceleration``, math from
``synthetic_sim.py:318-340``) builds an ``[..., N, N, 3]`` relative-position
tensor in the XLA path.  For large N this round-trips O(N^2 * 3) floats
through HBM; the Pallas kernel keeps the whole pairwise computation in VMEM
per batch element (coordinates-last layout ``[B, 8, Np]`` with N padded to
the 128-lane tile), writing only the O(N) accelerations back.

Zero-mass padding columns contribute nothing, so padding is exact.  The
kernel covers N <= 512 in one VMEM tile: at its peak (the three reduction
sums) it holds four live ``[Np, Np]`` f32 temporaries (dx, dy, dz, w) —
4 MB total at Np=512 vs a v5e core's ~16 MB VMEM, while Np=1024 would need
16 MB for the temporaries alone and fail Mosaic allocation.
``acceleration_auto`` falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.physics import compute_acceleration as xla_acceleration

_LANE = 128
_SUBLANE = 8


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _gravity_kernel(pos_ref, massw_ref, acc_ref, *, G: float, softening: float):
    """pos [8, Np] rows 0..2 = x,y,z; massw [8, Np] row 0 = mass (0 = pad)."""
    p = pos_ref[0]
    m_row = massw_ref[0][0:1, :]  # [1, Np]

    x = p[0:1, :]
    y = p[1:2, :]
    z = p[2:3, :]
    xt = jnp.transpose(x)  # [Np, 1]
    yt = jnp.transpose(y)
    zt = jnp.transpose(z)

    # rel[i, j] = r_j - r_i   (synthetic_sim.py:326-328 orientation)
    dx = x - xt
    dy = y - yt
    dz = z - zt
    r2 = dx * dx + dy * dy + dz * dz + softening * softening
    # guard r2 == 0 (softening=0 diagonal / coincident bodies) exactly like
    # the XLA path's jnp.where(r2 > 0, ...) — rsqrt(0) = inf would turn the
    # whole row NaN through 0 * inf
    inv_r = jnp.where(r2 > 0.0, jax.lax.rsqrt(jnp.where(r2 > 0.0, r2, 1.0)), 0.0)
    w = inv_r * inv_r * inv_r * m_row  # [Np, Np] *= m_j  (zero on padding)

    # acc_i = G * sum_j rel_ij * w_ij  (reduce over j = axis 1, keep 2D)
    ax = jnp.transpose(jnp.sum(dx * w, axis=1, keepdims=True))  # [1, Np]
    ay = jnp.transpose(jnp.sum(dy * w, axis=1, keepdims=True))
    az = jnp.transpose(jnp.sum(dz * w, axis=1, keepdims=True))
    acc_ref[0, 0:3, :] = G * jnp.concatenate([ax, ay, az], axis=0)
    acc_ref[0, 3:8, :] = jnp.zeros((5, ax.shape[-1]), ax.dtype)


@functools.partial(jax.jit, static_argnames=("G", "softening", "interpret"))
def pallas_acceleration(
    pos: jnp.ndarray,
    mass: jnp.ndarray,
    G: float,
    softening: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched acceleration via the Pallas kernel.

    Args:
      pos:  ``[B, N, 3]``.
      mass: ``[B, N, 1]``.
    Returns:
      ``[B, N, 3]`` accelerations identical to the XLA path.
    """
    B, N, _ = pos.shape
    Np = _pad_to(max(N, _LANE), _LANE)
    dtype = pos.dtype

    pos_t = jnp.zeros((B, _SUBLANE, Np), dtype)
    pos_t = pos_t.at[:, 0:3, :N].set(jnp.swapaxes(pos, 1, 2))
    mass_t = jnp.zeros((B, _SUBLANE, Np), dtype)
    mass_t = mass_t.at[:, 0, :N].set(mass[..., 0])

    kernel = functools.partial(_gravity_kernel, G=float(G), softening=float(softening))
    acc_t = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, _SUBLANE, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUBLANE, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _SUBLANE, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, _SUBLANE, Np), dtype),
        interpret=interpret,
    )(pos_t, mass_t)
    return jnp.swapaxes(acc_t[:, 0:3, :N], 1, 2)


def acceleration_auto(pos, mass, G, softening):
    """Pallas on TPU for batched inputs with N <= 512, else the XLA path."""
    use_pallas = (
        pos.ndim == 3
        and pos.shape[1] <= 512
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        return pallas_acceleration(pos, mass, G, softening)
    return xla_acceleration(pos, mass, G, softening)
