"""Dense graph geometry: the TPU replacement for edge-index graphs.

The reference builds sparse ``edge_index`` tensors with torch
(``utils/build_fully_connected_graph.py``) and scatters messages with
``torch_scatter``/PyG.  Here the graph of every simulation is a boolean
``[B, N, N]`` *neighbour mask* — ``mask[b, i, j] == True`` iff directed edge
``j -> i`` exists (node ``i`` receives from ``j``).  KNN becomes a top-k on a
dense distance matrix, and scatter-sum/mean become masked reductions over the
last axis; both are MXU/VPU friendly and shape-static for ``jit``/``scan``.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_sq_dists(pos: jnp.ndarray) -> jnp.ndarray:
    """``[..., N, N]`` squared pairwise distances (d2[i, j] = |r_i - r_j|^2)."""
    rel = pos[..., :, None, :] - pos[..., None, :, :]
    return jnp.sum(rel * rel, axis=-1)


def rel_positions(pos: jnp.ndarray) -> jnp.ndarray:
    """``rel[..., i, j, :] = pos_i - pos_j`` — receiver minus sender.

    Matches EGNN's ``coord_diff = coord[row] - coord[col]``
    (``models/egnn_mc/egnn_mc.py:155-157``) with the row/receiver first.
    """
    return pos[..., :, None, :] - pos[..., None, :, :]


def knn_mask(pos: jnp.ndarray, num_neighbors: int) -> jnp.ndarray:
    """Dense KNN adjacency, semantics of ``build_graph_with_knn``
    (``utils/build_fully_connected_graph.py:23-80``).

    ``mask[b, i, j] == True`` iff ``j`` is one of the ``num_neighbors`` nearest
    non-self nodes of ``i``.  ``num_neighbors == N - 1`` short-circuits to the
    fully-connected pattern (``:39-40``).

    Args:
      pos: ``[B, N, d]``.
      num_neighbors: ``0 < k <= N-1``.
    Returns:
      bool ``[B, N, N]``.
    """
    n = pos.shape[-2]
    if not 0 < num_neighbors < n:
        raise ValueError(
            "Graph cannot have more neighbors than there are nodes in simulation - 1"
        )
    eye = jnp.eye(n, dtype=bool)
    if num_neighbors == n - 1:
        return jnp.broadcast_to(~eye, pos.shape[:-1] + (n,))
    d2 = pairwise_sq_dists(pos)
    # Exclude self by pushing the diagonal to +inf before top-k smallest.
    d2 = jnp.where(eye, jnp.inf, d2)
    _, idx = jax.lax.top_k(-d2, num_neighbors)  # [..., N, k] nearest first
    onehot = jax.nn.one_hot(idx, n, dtype=jnp.float32)  # [..., N, k, N]
    return jnp.sum(onehot, axis=-2) > 0


def fully_connected_mask(batch_size: int, n: int) -> jnp.ndarray:
    """``[B, N, N]`` all-pairs-except-self mask."""
    return jnp.broadcast_to(~jnp.eye(n, dtype=bool), (batch_size, n, n))


def masked_segment_sum(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Sum messages over senders ``j``:  ``[B, N, N, ...] -> [B, N, ...]``.

    Replaces ``scatter(..., reduce='sum')`` over receivers.
    """
    m = mask.astype(values.dtype)
    m = m.reshape(m.shape + (1,) * (values.ndim - m.ndim))
    return jnp.sum(values * m, axis=2)


def masked_segment_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over senders with per-receiver degree normalisation.

    Matches ``_unsorted_segment_mean`` (``egnn_mc.py:33-42``) and PaiNN's
    degree-normalised aggregation (``PaiNN.py:165-169``): divide by
    ``max(degree, 1)``.
    """
    m = mask.astype(values.dtype)
    deg = jnp.clip(jnp.sum(m, axis=2), 1.0, None)  # [B, N]
    m = m.reshape(m.shape + (1,) * (values.ndim - m.ndim))
    deg = deg.reshape(deg.shape + (1,) * (values.ndim - 1 - deg.ndim))
    return jnp.sum(values * m, axis=2) / deg


def safe_sqrt(x: jnp.ndarray, eps: float = 1e-24) -> jnp.ndarray:
    """sqrt with finite gradients at 0.

    ``d sqrt(x)/dx -> inf`` as ``x -> 0``; guarding *after* the sqrt (clip /
    where) still produces ``0 * inf = NaN`` cotangents, so the guard must be
    inside: values below ``eps`` are clamped before the sqrt.  Needed because
    the dense formulation evaluates (then masks out) the zero-distance
    diagonal that a sparse edge list never materialises.
    """
    return jnp.sqrt(jnp.clip(x, eps, None))


def safe_unit(vec: jnp.ndarray, eps: float = 1e-8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unit vectors with zero-length guard (``PaiNN.py:440-448``) and
    NaN-free gradients at zero length.

    Returns ``(unit, norm)`` where ``unit`` is zero when ``norm <= eps``.
    """
    sq = jnp.sum(vec * vec, axis=-1, keepdims=True)
    good = sq > eps * eps
    norm = jnp.sqrt(jnp.where(good, sq, 1.0))
    unit = jnp.where(good, vec / norm, 0.0)
    true_norm = jnp.where(good, norm, 0.0)  # sub-eps lengths report as 0
    return unit, true_norm[..., 0]


def gaussian_rbf(d: jnp.ndarray, num_rbf: int, cutoff: float, start: float = 0.0):
    """Gaussian radial basis (``models/PaiNN/PaiNN.py:9-47``): centres on
    ``linspace(start, cutoff, n)``, width = grid step."""
    offsets = jnp.linspace(start, cutoff, num_rbf, dtype=d.dtype)
    step = jnp.abs(offsets[1] - offsets[0]) if num_rbf > 1 else jnp.asarray(cutoff - start, d.dtype)
    coeff = -0.5 / step**2
    diff = d[..., None] - offsets
    return jnp.exp(coeff * diff * diff)


def cosine_cutoff(d: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """Behler cosine cutoff window (``PaiNN.py:50-53``)."""
    vals = 0.5 * (jnp.cos(d * math.pi / cutoff) + 1.0)
    return vals * (d < cutoff).astype(d.dtype)


def polynomial_cutoff(d: jnp.ndarray, cutoff: float, p: int = 6) -> jnp.ndarray:
    """DimeNet-style polynomial cutoff used by PONITA's windowing
    (``models/ponita/utils/windowing.py:4-31``)."""
    x = d / cutoff
    a = -(p + 1.0) * (p + 2.0) / 2.0
    b = p * (p + 2.0)
    c = -p * (p + 1.0) / 2.0
    out = 1.0 + a * x**p + b * x ** (p + 1) + c * x ** (p + 2)
    return out * (x < 1.0).astype(d.dtype)
