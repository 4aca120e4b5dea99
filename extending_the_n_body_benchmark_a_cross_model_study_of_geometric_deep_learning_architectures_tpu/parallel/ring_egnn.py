"""Body-sharded ring edge stage for EGNN-MC: the big-N MODEL pass.

SURVEY §5.7 follow-through (round-2 VERDICT #5): :mod:`.ring` shards the
*ground-truth* pairwise force over the ``body`` mesh axis; this module does
the same for the EGNN-MC *model's* message pass so a full self-feed rollout
(`rollout/self_feed.py`) runs with every ``[B, N, N, ·]`` edge tensor
partitioned into ``[B, N/D, N/D, ·]`` blocks — peak memory O(N²/D²) per
device, the N-body analogue of ring attention:

* each device owns a block of ``N/D`` bodies (``h``, positions, velocities,
  masses — all O(N) state),
* at each of ``D`` ring steps a device accumulates the masked message /
  translation sums contributed by the *visiting* sender block to its
  *resident* receiver block, then forwards the visitors over ICI with
  ``lax.ppermute``,
* after ``D`` steps the masked means are exact: the self-pair is excluded
  at ring step 0 (when every device is visited by its own block).

Fully-connected graphs only — the reference's rollout default
(``infer_self_feed.py:58``: ``num_neighbors=None``); a KNN graph at big N
would itself need a distributed build.  The per-edge math (featurization +
edge MLP + coordinate head) is bit-for-bit the dense path's
(``models/egnn_mc.py:_EGNNBlock``; reference ``models/egnn_mc/egnn_mc.py:
108-164`` + ``dataloaders/egnn_mc_n_body_dataloader.py:37-59``), evaluated
per block.

Runs INSIDE ``shard_map`` over :data:`..parallel.mesh.BODY_AXIS` — see
``parallel.sharded.make_body_ring_rollout_fn``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import BODY_AXIS


def _block_sums(
    hA, hB_v, nd_i, nd_v, wg, W2, b2, Wc1, bc1, wc2, keep, tanh, norm_diff
):
    """Masked (agg, trans) SUMS of the visiting sender block onto the
    resident receivers.

    hA ``[B, NI, He]``; hB_v ``[B, NJ, He]``; nd_i/nd_v ``[B, N*, 10]``
    (lanes 0-2 pos0, 3-5 vel, 6 mass, 7-9 coord); keep ``[NI, NJ]`` f32.
    """
    dtype = hA.dtype
    f32 = jnp.float32
    p0i, p0v = nd_i[..., 0:3].astype(f32), nd_v[..., 0:3].astype(f32)
    vi, vv = nd_i[..., 3:6].astype(f32), nd_v[..., 3:6].astype(f32)
    mi, mv = nd_i[..., 6:7].astype(f32), nd_v[..., 6:7].astype(f32)
    ci, cv = nd_i[..., 7:10].astype(f32), nd_v[..., 7:10].astype(f32)

    # featurize block (dataloader parity): r̂0/d0² from initial positions
    cd0 = p0i[:, :, None, :] - p0v[:, None, :, :]  # [B, NI, NJ, 3]
    d2_0 = jnp.sum(cd0 * cd0, axis=-1, keepdims=True)
    dist0 = jnp.maximum(jnp.sqrt(jnp.maximum(d2_0, 0.0)), 1e-12)
    dir0 = cd0 / dist0
    proj_i = jnp.sum(vi[:, :, None, :] * dir0, axis=-1, keepdims=True)
    proj_j = jnp.sum(vv[:, None, :, :] * dir0, axis=-1, keepdims=True)
    mass_prod = mi[:, :, None, :] * mv[:, None, :, :]

    # coord2radial on the current layer coordinates
    cd = ci[:, :, None, :] - cv[:, None, :, :]
    radial = jnp.sum(cd * cd, axis=-1, keepdims=True)
    if norm_diff:
        cd = cd / jnp.maximum(jnp.sqrt(jnp.maximum(radial, 0.0)), 1.0)

    scal = jnp.concatenate(
        [radial, mass_prod, proj_i, proj_j, d2_0], axis=-1
    ).astype(dtype)
    m1 = jax.nn.silu(hA[:, :, None, :] + hB_v[:, None, :, :] + scal @ wg)
    m2 = jax.nn.silu(m1 @ W2 + b2)

    keep4 = keep[None, :, :, None]
    agg_sum = jnp.sum(m2 * keep4, axis=2)  # [B, NI, He]

    w = jax.nn.silu(m2 @ Wc1 + bc1) @ wc2[:, None]
    if tanh:
        w = jnp.tanh(w)
    trans = jnp.clip(w.astype(f32) * cd, -100.0, 100.0)
    trans_sum = jnp.sum(trans * keep4, axis=2)  # [B, NI, 3]
    return agg_sum, trans_sum


def ring_edge_stage(
    hA: jnp.ndarray,  # [B, N/D, He] local receiver projections
    hB: jnp.ndarray,  # [B, N/D, He] local sender projections
    pos0: jnp.ndarray,  # [B, N/D, 3] initial positions (featurize basis)
    vel: jnp.ndarray,  # [B, N/D, 3]
    mass: jnp.ndarray,  # [B, N/D, 1]
    coord: jnp.ndarray,  # [B, N/D, 3] current layer coordinates
    wg: jnp.ndarray,  # [5, He]
    W2: jnp.ndarray,
    b2: jnp.ndarray,
    Wc1: jnp.ndarray,
    bc1: jnp.ndarray,
    wc2: jnp.ndarray,  # [Hc]
    tanh: bool = True,
    norm_diff: bool = True,
    axis: str = BODY_AXIS,
):
    """Fully-connected masked means ``(agg [B,N/D,He], trans [B,N/D,3])``
    over ALL N senders, computed in D ring steps.  Must be traced inside
    ``shard_map`` with ``axis`` bound to the body mesh axis."""
    D = jax.lax.psum(1, axis)
    n_local = hA.shape[1]
    f32 = jnp.float32
    nodes = jnp.concatenate(
        [pos0.astype(f32), vel.astype(f32), mass.astype(f32), coord.astype(f32)],
        axis=-1,
    )  # [B, N/D, 10]
    perm = [(j, (j + 1) % D) for j in range(D)]
    eye = jnp.eye(n_local, dtype=f32)
    ones = jnp.ones((n_local, n_local), f32)

    def body(s, carry):
        acc_agg, acc_tr, hB_v, nd_v = carry
        # ring step 0: every device is visited by its own block -> exclude
        # the self-pair diagonal (knn_mask(N-1) parity)
        keep = jnp.where(s == 0, ones - eye, ones)
        a_sum, t_sum = _block_sums(
            hA, hB_v, nodes, nd_v, wg, W2, b2, Wc1, bc1, wc2,
            keep, tanh, norm_diff,
        )
        acc_agg = acc_agg + a_sum.astype(f32)
        acc_tr = acc_tr + t_sum
        hB_v = jax.lax.ppermute(hB_v, axis, perm)
        nd_v = jax.lax.ppermute(nd_v, axis, perm)
        return acc_agg, acc_tr, hB_v, nd_v

    acc0 = (
        jnp.zeros(hA.shape, f32),
        jnp.zeros(coord.shape, f32),
        hB,
        nodes,
    )
    acc_agg, acc_tr, _, _ = jax.lax.fori_loop(0, D, body, acc0)
    inv = 1.0 / (n_local * D - 1)  # fully connected: count = N - 1
    return (acc_agg * inv).astype(hA.dtype), acc_tr * inv
