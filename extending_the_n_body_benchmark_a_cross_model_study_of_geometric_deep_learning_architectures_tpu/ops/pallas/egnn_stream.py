"""Streaming EGNN edge-stage kernel (v3): flash-style sender accumulation.

Round-2 VERDICT ask #2 ("streaming aggregation") and the big-N enabler
(SURVEY §5.7): unlike :mod:`.egnn_messages` (v1/v2), which holds one full
sender span ``[N, He]`` per program and receives a materialised
``[B, N, N, 8]`` geometry tensor from XLA, this kernel

* tiles BOTH the receiver axis (``TI``) and the sender axis (``TJ``) and
  accumulates the masked sums for ``agg``/``trans`` in f32 VMEM scratch
  across sender tiles — the per-edge message tensor never exists outside
  VMEM at any scale, and per-program VMEM is O(TI·TJ·He) regardless of N;
* computes ALL per-edge geometry in-kernel from O(N) node data (initial
  position, velocity, mass, current coordinates): the ``[B, N, N, 8]``
  geometry and ``[B, N, N, 4]`` edge-attr HBM tensors of the dense path
  (reference ``dataloaders/egnn_mc_n_body_dataloader.py:37-59`` +
  ``models/egnn_mc/egnn_mc.py:155-164``) vanish entirely.  Only the mask
  (``[B, N, N]``, the graph itself) is streamed from HBM.

HBM traffic per layer: O(B·N·He) node tensors + O(B·N²) mask — vs the
dense XLA path's O(B·N²·He) message hand-off.  At the bench shape
(N=100) XLA's fusions win on VPU throughput (see BENCH_NOTES.md); the
streaming kernel's regime is large N, where ``[B, N, N, He]`` cannot be
materialised at all (N=1024: 2.1 GB bf16 per layer per tensor).

Edge math (exact dense-path parity, ``models/egnn_mc.py:_EGNNBlock``):

    e_ij   = [m_i m_j, v_i·r̂0, v_j·r̂0, d0²]        (r̂0 from initial pos)
    g_ij   = [|c_i-c_j|², e_ij] @ Wg                 (c = current coords)
    m_ij   = silu(silu(hA_i + hB_j + g_ij) @ W2 + b2)
    agg_i  = Σ_j mask·m_ij / cnt_i
    w_ij   = [tanh](silu(m_ij @ Wc1 + bc1) @ wc2)
    t_i    = Σ_j mask·clip(w_ij·cd_ij, ±100) / cnt_i  (cd normalised if
                                                       norm_diff)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT_TI = 32
_DEFAULT_TJ = 128
_NODE_LANES = 16  # 0-2 pos0, 3-5 vel, 6 mass, 8-10 coord, rest zero


def _kernel(
    hA_ref,  # [1, TI, He]
    hB_ref,  # [1, TJ, He]
    ni_ref,  # [1, TI, 16]   receiver node data (f32)
    njT_ref,  # [1, 16, TJ]  sender node data, transposed (f32)
    mask_ref,  # [1, TI, TJ] (1.0 = edge active)
    w_geom_ref,  # [8, He]    rows 0-4: radial, m_i m_j, proj_i, proj_j, d0²
    W2_ref,  # [He, He]
    b2_ref,  # [1, He]
    Wc1_ref,  # [He, Hc]
    bc1_ref,  # [1, Hc]
    wc2_ref,  # [Hc, 8]      only column 0 used
    agg_ref,  # [1, TI, He]  out (written on the last sender tile)
    trans_ref,  # [1, TI, 8] out f32
    acc_agg,  # [TI, He] f32 scratch
    acc_tr,  # [TI, 8]  f32 scratch: lanes 0-2 trans sums, lane 3 count
    *,
    tanh: bool,
    norm_diff: bool,
    elem_bf16: bool,
):
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    op_dtype = hA_ref.dtype

    @pl.when(j == 0)
    def _init():
        acc_agg[...] = jnp.zeros_like(acc_agg)
        acc_tr[...] = jnp.zeros_like(acc_tr)

    hA = hA_ref[0]  # [TI, He]
    hB = hB_ref[0]  # [TJ, He]
    ni = ni_ref[0]  # [TI, 16] f32
    njT = njT_ref[0]  # [16, TJ] f32
    mask = mask_ref[0]  # [TI, TJ] f32
    ti, tj = mask.shape
    he = hA.shape[-1]

    def ci(k):  # receiver column -> [TI, 1]
        return ni[:, k : k + 1]

    def rj(k):  # sender row -> [1, TJ]
        return njT[k : k + 1, :]

    # --- featurize geometry (dataloader parity): r̂0 / d0² from initial pos
    cd0 = [ci(k) - rj(k) for k in range(3)]  # [TI, TJ] x3
    d2_0 = cd0[0] * cd0[0] + cd0[1] * cd0[1] + cd0[2] * cd0[2]
    inv_d0 = 1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(d2_0, 0.0)), 1e-12)
    dir0 = [c * inv_d0 for c in cd0]
    proj_i = ci(3) * dir0[0] + ci(4) * dir0[1] + ci(5) * dir0[2]
    proj_j = rj(3) * dir0[0] + rj(4) * dir0[1] + rj(5) * dir0[2]
    mass_prod = ci(6) * rj(6)

    # --- coord2radial on the CURRENT layer coordinates
    cd = [ci(8 + k) - rj(8 + k) for k in range(3)]
    radial = cd[0] * cd[0] + cd[1] * cd[1] + cd[2] * cd[2]
    if norm_diff:
        inv_norm = 1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(radial, 0.0)), 1.0)
        cd = [c * inv_norm for c in cd]

    # elem_bf16: run the [TI,TJ,He]-sized elementwise stack (the kernel's
    # dominant VPU volume — two silus + the mask multiply) in bf16 for 2x
    # VPU packing; matmuls still accumulate f32 on the MXU.  Numerics class
    # matches the xla-bfloat16 rollout config (messages stored bf16 there).
    edt = jnp.bfloat16 if elem_bf16 else jnp.float32

    def silu(x):
        # jax.nn.silu broadcasts an f32 literal into bf16 vectors, which
        # Mosaic's verifier rejects ('vector.broadcast' element-type
        # mismatch); spell it with a literal typed like x instead
        one = jnp.asarray(1.0, x.dtype)
        return x * (one / (one + jnp.exp(-x)))

    # g_term[(i,j),:] = Σ_s scal_s[i,j] · Wg[s,:] — one [TI·TJ,8]@[8,He]
    # MXU matmul (wg is zero-padded to 8 rows by the wrapper) instead of
    # five full-size rank-1 VPU FMA passes: the scalar stack is only
    # O(TI·TJ·8) and the broadcast work rides the systolic array.
    zero = jnp.zeros_like(radial)
    scal = jnp.stack(
        (radial, mass_prod, proj_i, proj_j, d2_0, zero, zero, zero),
        axis=-1,
    ).reshape(ti * tj, 8)  # [TI*TJ, 8]
    g_term = jnp.dot(
        scal, w_geom_ref[...].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(ti, tj, he)

    m1 = silu(
        (
            hA[:, None, :].astype(jnp.float32)
            + hB[None, :, :].astype(jnp.float32)
            + g_term
        ).astype(edt)
    )
    m2 = silu(
        (
            jnp.dot(
                m1.reshape(ti * tj, he).astype(op_dtype),
                W2_ref[...],
                preferred_element_type=jnp.float32,
            )
            + b2_ref[0][None, :].astype(jnp.float32)
        ).astype(edt)
    )  # [TI*TJ, He]

    # masked partial aggregation into scratch
    m2m = m2.reshape(ti, tj, he) * mask[:, :, None].astype(edt)
    acc_agg[...] += jnp.sum(m2m.astype(jnp.float32), axis=1)

    # per-edge coordinate weight
    w = jax.nn.silu(
        jnp.dot(m2.astype(op_dtype), Wc1_ref[...], preferred_element_type=jnp.float32)
        + bc1_ref[0][None, :].astype(jnp.float32)
    )
    w = jnp.dot(w.astype(op_dtype), wc2_ref[...], preferred_element_type=jnp.float32)[
        :, 0
    ]
    if tanh:
        w = jnp.tanh(w)
    w2d = w.reshape(ti, tj)
    for k in range(3):
        part = jnp.sum(
            jnp.clip(w2d * cd[k], -100.0, 100.0) * mask, axis=1, keepdims=True
        )
        acc_tr[:, k : k + 1] += part
    acc_tr[:, 3:4] += jnp.sum(mask, axis=1, keepdims=True)

    @pl.when(j == nj - 1)
    def _finalize():
        inv_cnt = 1.0 / jnp.maximum(acc_tr[:, 3:4], 1.0)
        agg_ref[0] = (acc_agg[...] * inv_cnt).astype(agg_ref.dtype)
        trans_ref[0, :, 0:3] = acc_tr[:, 0:3] * inv_cnt
        trans_ref[0, :, 3:8] = jnp.zeros((ti, 5), trans_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tanh", "norm_diff", "interpret", "tile_i", "tile_j", "elem_bf16",
    ),
)
def streaming_egnn_messages(
    hA: jnp.ndarray,  # [B, N, He] = h @ W1a + b1
    hB: jnp.ndarray,  # [B, N, He] = h @ W1b
    pos0: jnp.ndarray,  # [B, N, 3] initial positions (featurize basis)
    vel: jnp.ndarray,  # [B, N, 3]
    mass: jnp.ndarray,  # [B, N, 1]
    coord: jnp.ndarray,  # [B, N, 3] current layer coordinates
    mask: jnp.ndarray,  # [B, N, N] bool
    w_geom: jnp.ndarray,  # [5, He] rows: radial, m_i m_j, proj_i, proj_j, d0²
    W2: jnp.ndarray,
    b2: jnp.ndarray,
    Wc1: jnp.ndarray,
    bc1: jnp.ndarray,
    wc2: jnp.ndarray,  # [Hc]
    tanh: bool = True,
    norm_diff: bool = True,
    interpret: bool = False,
    tile_i: int = _DEFAULT_TI,
    tile_j: int = _DEFAULT_TJ,
    elem_bf16: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(agg [B,N,He], trans [B,N,3] f32)`` — masked means over
    senders, accumulated across sender tiles (no O(N²·He) HBM tensors)."""
    B, N, He = hA.shape
    Hc = Wc1.shape[1]
    TI = min(tile_i, ((N + 7) // 8) * 8)
    # TJ is a LANE dimension of the njT/mask blocks: Mosaic requires lane
    # blocks to be a multiple of 128 or the full (padded) array dimension.
    # Single j-tile when N fits in tile_j; otherwise exactly 128: the
    # kernel keeps ~5 live [TI·TJ, He] f32 intermediates in VMEM (~16 MB
    # per core), and TJ=256 with TI=32/He=128 crashes the Mosaic compiler
    # outright (measured on v5e, 2026-08-20 — scripts/stream_compile_probe.py;
    # TJ=128 compiles through N=1024).
    if N <= tile_j:
        TJ = ((N + 7) // 8) * 8
    else:
        TJ = 128
    pad_i = (-N) % TI
    pad_j = (-N) % TJ
    f32 = jnp.float32

    nodes = jnp.zeros((B, N, _NODE_LANES), f32)
    nodes = nodes.at[..., 0:3].set(pos0.astype(f32))
    nodes = nodes.at[..., 3:6].set(vel.astype(f32))
    nodes = nodes.at[..., 6:7].set(mass.astype(f32))
    nodes = nodes.at[..., 8:11].set(coord.astype(f32))

    ni = jnp.pad(nodes, ((0, 0), (0, pad_i), (0, 0)))
    njT = jnp.swapaxes(jnp.pad(nodes, ((0, 0), (0, pad_j), (0, 0))), 1, 2)
    hA_p = jnp.pad(hA, ((0, 0), (0, pad_i), (0, 0)))
    hB_p = jnp.pad(hB, ((0, 0), (0, pad_j), (0, 0)))
    mask_p = jnp.pad(mask, ((0, 0), (0, pad_i), (0, pad_j))).astype(f32)
    Ni, Nj = N + pad_i, N + pad_j

    w_geom8 = jnp.zeros((8, He), w_geom.dtype).at[0:5].set(w_geom)
    wc2_col = jnp.zeros((Hc, 8), wc2.dtype).at[:, 0].set(wc2)

    grid = (B, Ni // TI, Nj // TJ)
    kernel = functools.partial(
        _kernel, tanh=tanh, norm_diff=norm_diff, elem_bf16=elem_bf16
    )
    agg, trans = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TI, He), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TJ, He), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TI, _NODE_LANES), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NODE_LANES, TJ), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TI, TJ), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, He), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((He, He), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, He), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((He, Hc), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hc), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hc, 8), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TI, He), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TI, 8), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Ni, He), hA.dtype),
            # trans feeds the f32 coordinate update — never bf16
            jax.ShapeDtypeStruct((B, Ni, 8), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TI, He), f32),
            pltpu.VMEM((TI, 8), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(hA_p, hB_p, ni, njT, mask_p, w_geom8, W2, b2[None, :], Wc1,
      bc1[None, :], wc2_col)
    return agg[:, :N], trans[:, :N, 0:3]
