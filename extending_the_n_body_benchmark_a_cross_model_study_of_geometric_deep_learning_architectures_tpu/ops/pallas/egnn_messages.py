"""Fused EGNN message + aggregation Pallas kernel — the rollout hot path.

One EGNN-MC layer's edge stage is

    m_ij   = silu(W2 @ silu(W1 @ [h_i, h_j, d2_ij, e_ij] + b1) + b2)
    agg_i  = mean_j m_ij
    w_ij   = tanh(wc2 @ silu(Wc1 @ m_ij + bc1))
    t_i    = mean_j clamp(w_ij * coord_diff_ij, +-100)

(``models/egnn_mc/egnn_mc.py:108-153`` in the reference; dense XLA port in
``models.egnn_mc._EGNNBlock``).  In XLA the intermediate messages are
``[B, N, N, He]`` tensors that round-trip HBM between the two matmuls —
at the bench shape (B=64, N=100, He=128) that is ~650 MB of traffic per
layer per rollout step.  This kernel tiles the receiver axis, keeps every
``[TI, N, He]`` intermediate in VMEM and writes only the ``O(N)``
aggregates, cutting HBM traffic ~10x.

Decomposition: ``W1 @ concat(h_i, h_j, g_ij)`` splits into per-node
projections ``hA = h @ W1[:H] + b1`` and ``hB = h @ W1[H:2H]`` (computed
once outside, O(N)) plus the in-kernel geometric term
``g_ij @ W1_geom`` where ``g_ij = [d2, e_ij(4), coord_diff(3)]`` is packed
into an 8-lane geometry tensor.

Supports N <= MAX_N (=256) per simulation — one j-span in VMEM; the
receiver tile is tunable (``tile`` arg, default ``_DEFAULT_TI``; VMEM use
scales with tile * N * He — f32/He=128/N=100 fits tile 32, bf16 fits 64).
Inputs may be f32 or bf16 (all in-kernel compute in f32).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_N = 256
_DEFAULT_TI = 32  # receiver rows per program (grid = B * ceil(N/TI))
_GEOM_LANES = 8  # [radial, eattr0..3, cd_x, cd_y, cd_z]


def _kernel(
    hA_ref,  # [1, TI, He]
    hB_ref,  # [1, N, He]
    geom_ref,  # [1, TI, N, 8]
    mask_ref,  # [1, TI, N]  (1.0 = edge active)
    w_geom_ref,  # [8, He]   rows: radial w, eattr rows 1..4, rows 5..7 zero
    W2_ref,  # [He, He]
    b2_ref,  # [1, He]
    Wc1_ref,  # [He, Hc]
    bc1_ref,  # [1, Hc]
    wc2_ref,  # [Hc, 8]   only column 0 used (padded for lane alignment)
    agg_ref,  # [1, TI, He]
    trans_ref,  # [1, TI, 8]
    *,
    tanh: bool,
    he: int,
    hc: int,
):
    # Matmul operands stay in the storage dtype (bf16 ops with f32
    # accumulation hit the fast MXU path); elementwise math runs in f32.
    # The sender dim N is padded to a sublane multiple by the wrapper so the
    # (TI, N, He) -> (TI*N, He) reshapes below are layout no-ops.
    op_dtype = hA_ref.dtype
    hA = hA_ref[0]  # [TI, He]
    hB = hB_ref[0]  # [N, He]
    geom = geom_ref[0]  # [TI, N, 8]  (f32)
    mask = mask_ref[0]  # [TI, N]     (f32)
    ti, n = mask.shape

    # m1 = silu(hA_i + hB_j + g_ij @ Wg)  -- [TI, N, He]
    g_flat = geom.reshape(ti * n, _GEOM_LANES)
    g_term = jnp.dot(
        g_flat[:, 0:5].astype(op_dtype), w_geom_ref[0:5, :],
        preferred_element_type=jnp.float32,
    ).reshape(ti, n, he)
    m1 = jax.nn.silu(
        hA[:, None, :].astype(jnp.float32)
        + hB[None, :, :].astype(jnp.float32)
        + g_term
    )

    # m2 = silu(m1 @ W2 + b2)
    m2 = jax.nn.silu(
        jnp.dot(
            m1.reshape(ti * n, he).astype(op_dtype),
            W2_ref[:, :],
            preferred_element_type=jnp.float32,
        )
        + b2_ref[0][None, :].astype(jnp.float32)
    )  # [TI*N, He] f32

    # message aggregation (masked mean over senders)
    count = jnp.sum(mask, axis=1, keepdims=True)  # [TI, 1]
    inv_count = 1.0 / jnp.maximum(count, 1.0)
    m2m = m2.reshape(ti, n, he) * mask[:, :, None]
    agg_ref[0] = (jnp.sum(m2m, axis=1) * inv_count).astype(agg_ref.dtype)

    # coordinate weights: scalar per edge
    w = jax.nn.silu(
        jnp.dot(m2.astype(op_dtype), Wc1_ref[:, :], preferred_element_type=jnp.float32)
        + bc1_ref[0][None, :].astype(jnp.float32)
    )
    w = jnp.dot(
        w.astype(op_dtype), wc2_ref[:, :], preferred_element_type=jnp.float32
    )[:, 0]
    if tanh:
        w = jnp.tanh(w)
    trans = jnp.clip(w.reshape(ti, n, 1) * geom[:, :, 5:8], -100.0, 100.0)
    trans = jnp.sum(trans * mask[:, :, None], axis=1) * inv_count  # [TI, 3]
    trans_ref[0, :, 0:3] = trans.astype(trans_ref.dtype)
    trans_ref[0, :, 3:8] = jnp.zeros((ti, 5), trans_ref.dtype)


def _kernel_v2(
    hA_ref,  # [1, TI, He]
    hB_ref,  # [1, N, He]
    scal_ref,  # [1, 8, TI, N]  f32 planes: radial, eattr0..3, cd_x, cd_y, cd_z
    mask_ref,  # [1, TI, N]  (1.0 = edge active)
    w_geom_ref,  # [8, He]
    W2_ref,  # [He, He]
    b2_ref,  # [1, He]
    Wc1_ref,  # [He, Hc]
    bc1_ref,  # [1, Hc]
    wc2_ref,  # [Hc, 8]  only column 0 used
    agg_ref,  # [1, TI, He]
    trans_ref,  # [1, TI, 8]
    *,
    tanh: bool,
    he: int,
    hc: int,
):
    """V2 of :func:`_kernel`: geometry arrives as full-lane ``[TI, N]`` scalar
    planes instead of a ``[TI, N, 8]`` tensor, so no narrow-lane (8-wide)
    VMEM buffers or relayouting reshapes exist; the geometric projection is
    five broadcast FMAs instead of a skinny matmul."""
    op_dtype = hA_ref.dtype
    hA = hA_ref[0]  # [TI, He]
    hB = hB_ref[0]  # [N, He]
    scal = scal_ref[0]  # [8, TI, N] f32
    mask = mask_ref[0]  # [TI, N]   f32
    ti, n = mask.shape

    # g_term[i,j,:] = sum_k scal_k[i,j] * Wg[k,:]  -- [TI, N, He]
    g_term = scal[0][:, :, None] * w_geom_ref[0:1, :][None].astype(jnp.float32)
    for k in range(1, 5):
        g_term += scal[k][:, :, None] * w_geom_ref[k : k + 1, :][None].astype(
            jnp.float32
        )

    m1 = jax.nn.silu(
        hA[:, None, :].astype(jnp.float32)
        + hB[None, :, :].astype(jnp.float32)
        + g_term
    )

    m2 = jax.nn.silu(
        jnp.dot(
            m1.reshape(ti * n, he).astype(op_dtype),
            W2_ref[:, :],
            preferred_element_type=jnp.float32,
        )
        + b2_ref[0][None, :].astype(jnp.float32)
    )  # [TI*N, He] f32

    count = jnp.sum(mask, axis=1, keepdims=True)  # [TI, 1]
    inv_count = 1.0 / jnp.maximum(count, 1.0)
    m2m = m2.reshape(ti, n, he) * mask[:, :, None]
    agg_ref[0] = (jnp.sum(m2m, axis=1) * inv_count).astype(agg_ref.dtype)

    w = jax.nn.silu(
        jnp.dot(m2.astype(op_dtype), Wc1_ref[:, :], preferred_element_type=jnp.float32)
        + bc1_ref[0][None, :].astype(jnp.float32)
    )
    w = jnp.dot(
        w.astype(op_dtype), wc2_ref[:, :], preferred_element_type=jnp.float32
    )[:, 0]
    if tanh:
        w = jnp.tanh(w)
    w2d = w.reshape(ti, n)
    cols = [
        jnp.sum(jnp.clip(w2d * scal[5 + k], -100.0, 100.0) * mask, axis=1, keepdims=True)
        * inv_count
        for k in range(3)
    ]
    trans_ref[0, :, 0:3] = jnp.concatenate(cols, axis=1).astype(trans_ref.dtype)
    trans_ref[0, :, 3:8] = jnp.zeros((ti, 5), trans_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tanh", "interpret", "tile", "version")
)
def fused_egnn_messages(
    hA: jnp.ndarray,  # [B, N, He]  = h @ W1a + b1
    hB: jnp.ndarray,  # [B, N, He]  = h @ W1b
    geom: jnp.ndarray,  # [B, N, N, 8] = [d2, eattr(4), coord_diff(3)]
    mask: jnp.ndarray,  # [B, N, N] bool
    w_geom: jnp.ndarray,  # [5, He]  rows: radial, eattr 0..3
    W2: jnp.ndarray,
    b2: jnp.ndarray,
    Wc1: jnp.ndarray,
    bc1: jnp.ndarray,
    wc2: jnp.ndarray,  # [Hc]
    tanh: bool = True,
    interpret: bool = False,
    tile: int = _DEFAULT_TI,
    version: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(agg [B,N,He], trans [B,N,3])`` — masked means over senders.

    ``version=2`` feeds geometry as full-lane ``[B, 8, N, N]`` scalar planes
    (see :func:`_kernel_v2`); ``version=1`` (default — measured faster on
    v5e, see BENCH_NOTES.md) keeps the ``[B, N, N, 8]`` packed-lane
    layout."""
    B, N, He = hA.shape
    Hc = Wc1.shape[1]
    _TI = min(tile, ((N + 7) // 8) * 8)
    # receiver axis -> multiple of the tile; sender axis -> sublane multiple
    # (8) so in-kernel (TI, Nj, He) -> (TI*Nj, He) reshapes are layout no-ops
    pad_i = (-N) % _TI
    pad_j = (-N) % 8
    if pad_i or pad_j:
        hA = jnp.pad(hA, ((0, 0), (0, pad_i), (0, 0)))
        hB = jnp.pad(hB, ((0, 0), (0, pad_j), (0, 0)))
        geom = jnp.pad(geom, ((0, 0), (0, pad_i), (0, pad_j), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_i), (0, pad_j)))
    Ni = hA.shape[1]
    Nj = hB.shape[1]

    w_geom8 = jnp.zeros((8, He), w_geom.dtype).at[0:5].set(w_geom)
    wc2_col = jnp.zeros((Hc, 8), wc2.dtype).at[:, 0].set(wc2)
    # mask/geom carry elementwise-only data: keep f32 (bf16 reshape limits)
    maskf = mask.astype(jnp.float32)
    geom = geom.astype(jnp.float32)

    grid = (B, Ni // _TI)
    weight_specs = [
        pl.BlockSpec((8, He), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((He, He), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, He), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((He, Hc), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Hc), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Hc, 8), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, _TI, He), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _TI, 8), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, Ni, He), hA.dtype),
        # trans feeds the coordinate update, which stays f32 under mixed
        # precision (models/egnn_mc.py keeps coords in the scene dtype) —
        # emitting it in the bf16 message dtype would erode position mantissa
        jax.ShapeDtypeStruct((B, Ni, 8), jnp.float32),
    )
    weights = (w_geom8, W2, b2[None, :], Wc1, bc1[None, :], wc2_col)

    if version == 2:
        scal = jnp.moveaxis(geom, -1, 1)  # [B, 8, Ni, Nj] f32 planes
        kernel = functools.partial(_kernel_v2, tanh=tanh, he=He, hc=Hc)
        agg, trans = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, _TI, He), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, Nj, He), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, _GEOM_LANES, _TI, Nj), lambda b, i: (b, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, _TI, Nj), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
                ),
                *weight_specs,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(hA, hB, scal, maskf, *weights)
    else:
        kernel = functools.partial(_kernel, tanh=tanh, he=He, hc=Hc)
        agg, trans = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, _TI, He), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, Nj, He), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, _TI, Nj, _GEOM_LANES), lambda b, i: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, _TI, Nj), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
                ),
                *weight_specs,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(hA, hB, geom, maskf, *weights)
    return agg[:, :N], trans[:, :N, 0:3]
