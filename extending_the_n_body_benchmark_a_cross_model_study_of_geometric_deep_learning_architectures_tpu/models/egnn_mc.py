"""EGNN-MC: E(n)-equivariant GNN with velocity channel and per-target heads.

TPU-native dense reformulation of ``models/egnn_mc/egnn_mc.py`` (torch +
scatter).  Node/edge tensors are ``[B, N, ...]`` / ``[B, N, N, ...]`` and all
scatter-means are masked reductions, so the whole forward is a handful of
batched matmuls + VPU elementwise ops that XLA fuses.

Featurization (the reference's dataloader step,
``dataloaders/egnn_mc_n_body_dataloader.py:8-61``) is folded into
:meth:`EGNNMC.__call__` so that train/rollout run it inside the same jit:

* node features ``x = [|v|, m]``
* edge attrs   ``[m_i m_j, v_i·r̂, v_j·r̂, d^2]`` with ``r̂ = (r_i - r_j)/d``
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core import graph as G
from ..core.scene import Scene
from .common import (
    MLP,
    TorchLinear,
    get_activation,
    torch_bias_init_for,
    torch_kernel_init,
    xavier_uniform_gain,
)


def _diag(x: jnp.ndarray) -> jnp.ndarray:
    """Diagonal of a ``[B, N, N, E]`` edge tensor -> ``[B, N, E]``."""
    return jnp.moveaxis(jnp.diagonal(x, axis1=1, axis2=2), -1, 1)


class _EGNNBlock(nn.Module):
    """One message-passing block (``egnn_mc.py:45-186``).

    The edge stage's parameters are declared explicitly so the XLA dense
    path and the fused Pallas kernel
    (:func:`..ops.pallas.egnn_messages.fused_egnn_messages`) share them.
    ``use_pallas`` requires silu activation and is intended for rollout on
    TPU at larger N where the [B,N,N,He] message tensors dominate HBM.
    """

    hidden_node_dim: int
    hidden_edge_dim: int
    hidden_coord_dim: int
    edge_attr_dim: int
    activation: str = "silu"
    coords_weight: float = 1.0
    recurrent: bool = True
    norm_diff: bool = False
    tanh: bool = False
    use_pallas: bool = False
    pallas_tile: int = 32
    fc_fast: bool = False
    streaming: bool = False
    stream_tile_j: int = 128
    stream_elem_bf16: bool = False
    body_ring: bool = False

    @nn.compact
    def __call__(self, carry, velocity, edge_attr, mask):
        """carry = (h [B,N,H], coord [B,N,3]); velocity [B,N,3];
        edge_attr [B,N,N,E] — or, under ``streaming``, the O(N) tuple
        ``(pos0 [B,N,3], mass [B,N,1])`` the kernel featurizes from;
        mask [B,N,N].  (carry, out) form for nn.scan — one compiled layer
        body for any depth."""
        h, coord = carry
        act = get_activation(self.activation)
        H = h.shape[-1]
        He = self.hidden_edge_dim
        Hc = self.hidden_coord_dim
        E = self.edge_attr_dim
        in_dim = 2 * H + 1 + E

        def t_init(fan_in):
            return torch_bias_init_for(fan_in)

        # edge MLP params (MLP([He], He, silu, final_act) equivalent)
        W1 = self.param("edge_w1", torch_kernel_init, (in_dim, He))
        b1 = self.param("edge_b1", t_init(in_dim), (He,))
        W2 = self.param("edge_w2", torch_kernel_init, (He, He))
        b2 = self.param("edge_b2", t_init(He), (He,))
        # coord head params (TorchLinear(Hc) -> act -> Dense(1, xavier 1e-3))
        Wc1 = self.param("coord_w1", torch_kernel_init, (He, Hc))
        bc1 = self.param("coord_b1", t_init(He), (Hc,))
        wc2 = self.param("coord_w2", xavier_uniform_gain(0.001), (Hc, 1))

        dtype = h.dtype
        W1d, b1d, W2d, b2d = (p.astype(dtype) for p in (W1, b1, W2, b2))
        Wc1d, bc1d, wc2d = (p.astype(dtype) for p in (Wc1, bc1, wc2))

        # The edge MLP's first matmul is decomposed over the concat
        # ``[h_i, h_j, d^2, edge_attr] @ W1`` into per-node projections plus a
        # 5-feature geometric term — algebraically identical (summation
        # reorder only) but it never materialises the ``[B,N,N,2H+5]`` concat
        # tensor, the dominant HBM term of the naive dense formulation.
        hA = h @ W1d[:H] + b1d  # receiver term  [B,N,He]
        hB = h @ W1d[H : 2 * H]  # sender term    [B,N,He]

        if self.body_ring:
            # Body-sharded ring message pass (must be traced inside
            # shard_map over the body mesh axis): every [B,N,N,*] edge
            # tensor partitions into [B,N/D,N/D,*] per-device blocks —
            # parallel/ring_egnn.py, the big-N MULTI-chip path.
            from ..parallel.ring_egnn import ring_edge_stage

            pos0, mass0 = edge_attr
            agg, trans_mean = ring_edge_stage(
                hA, hB, pos0, velocity, mass0, coord,
                W1d[2 * H :], W2d, b2d, Wc1d, bc1d, wc2d[:, 0],
                tanh=self.tanh, norm_diff=self.norm_diff,
            )
            coord = coord + trans_mean.astype(coord.dtype) * self.coords_weight
            return self._finish(h, coord, velocity, agg)

        if self.streaming:
            # Flash-style sender-tile kernel: geometry (incl. coord2radial
            # and the dataloader edge attrs) is computed in-kernel from the
            # O(N) node tuple, so no [B,N,N,*] tensor exists in HBM at all —
            # the big-N path (ops/pallas/egnn_stream.py).
            from ..ops.pallas.egnn_stream import streaming_egnn_messages

            pos0, mass0 = edge_attr
            agg, trans_mean = streaming_egnn_messages(
                hA, hB, pos0, velocity, mass0, coord, mask,
                W1d[2 * H :], W2d, b2d, Wc1d, bc1d, wc2d[:, 0],
                tanh=self.tanh, norm_diff=self.norm_diff,
                tile_i=self.pallas_tile, tile_j=self.stream_tile_j,
                elem_bf16=self.stream_elem_bf16,
            )
            coord = coord + trans_mean.astype(coord.dtype) * self.coords_weight
            return self._finish(h, coord, velocity, agg)

        # --- coord2radial (egnn_mc.py:155-164): receiver-minus-sender diffs.
        coord_diff = G.rel_positions(coord)  # [B,N,N,3]
        radial = jnp.sum(coord_diff * coord_diff, axis=-1, keepdims=True)
        if self.norm_diff:
            norm = jnp.clip(G.safe_sqrt(radial), 1.0, None)
            coord_diff = coord_diff / norm

        if self.use_pallas:
            from ..ops.pallas.egnn_messages import fused_egnn_messages

            geom = jnp.concatenate([radial, edge_attr, coord_diff], axis=-1)
            agg, trans_mean = fused_egnn_messages(
                hA, hB, geom, mask,
                W1d[2 * H :], W2d, b2d, Wc1d, bc1d, wc2d[:, 0],
                tanh=self.tanh, tile=self.pallas_tile,
            )
            coord = coord + trans_mean.astype(coord.dtype) * self.coords_weight
        else:
            # --- edge model (egnn_mc.py:108-122): [h_i, h_j, d^2, edge_attr].
            g_term = (
                jnp.concatenate([radial, edge_attr], axis=-1).astype(dtype)
                @ W1d[2 * H :]
            )  # [B,N,N,He]
            m_ij = act(
                act(hA[:, :, None, :] + hB[:, None, :, :] + g_term) @ W2d + b2d
            )

            # --- coord model (egnn_mc.py:135-153): scalar weight per edge.
            w = act(m_ij @ Wc1d + bc1d) @ wc2d
            if self.tanh:
                w = jnp.tanh(w)
            # coordinate update stays in the coord dtype (f32 under mixed
            # precision): only the scalar edge weight w comes from the
            # low-precision message stack.
            trans = jnp.clip(
                w.astype(coord.dtype) * coord_diff, -100.0, 100.0
            )  # [B,N,N,3]
            if self.fc_fast:
                # Fully-connected fast path: the only masked-out entries are
                # the diagonal (self-edges), so the two [B,N,N,He]-sized
                # mask-multiply VPU passes (the rollout's binding resource —
                # this stage is VPU-bound, BENCH_NOTES.md op profile) can be
                # dropped: trans's diagonal is exactly 0 (coord_diff_ii = 0,
                # so clip(w*0) = 0), and agg's diagonal is recomputed at
                # O(B*N) cost and subtracted.  Algebraically identical to the
                # masked means for an FC mask.
                n = h.shape[1]
                coord = coord + (
                    jnp.sum(trans, axis=2) / (n - 1)
                ) * self.coords_weight
                # diagonal message m_ii: radial_ii = 0 and the edge-attr
                # diagonal carries the self-pair features
                ea_diag = _diag(edge_attr).astype(dtype)  # [B,N,E]
                g_diag = ea_diag @ W1d[2 * H + 1 :]
                m_diag = act(act(hA + hB + g_diag) @ W2d + b2d)
                agg = (jnp.sum(m_ij, axis=2) - m_diag) / (n - 1)
            else:
                coord = (
                    coord + G.masked_segment_mean(trans, mask) * self.coords_weight
                )
                agg = G.masked_segment_mean(m_ij, mask)  # [B,N,He]

        return self._finish(h, coord, velocity, agg)

    def _finish(self, h, coord, velocity, agg):
        """Velocity-gated coord update + node model — shared by the dense,
        fused-pallas and streaming edge stages (same submodule creation
        order, so all paths share one param tree)."""
        # --- velocity-gated coord update (egnn_mc.py:178-183).
        w_vel = MLP(
            hidden=[self.hidden_coord_dim], out=1, activation=self.activation
        )(h)  # [B,N,1]
        coord = coord + w_vel * velocity

        # --- node model (egnn_mc.py:124-133).
        h_out = MLP(
            hidden=[self.hidden_node_dim],
            out=self.hidden_node_dim,
            activation=self.activation,
        )(jnp.concatenate([h, agg], axis=-1)).astype(h.dtype)
        if self.recurrent:
            h_out = h + h_out
        return (h_out, coord), None


class EGNNMC(nn.Module):
    """Full model (``egnn_mc.py:211-306``): embedding, L blocks, vector heads.

    ``__call__(scene, mask) -> [B, N, 3*num_targets]`` (pos_dt ‖ vel).
    """

    hidden_node_dim: int = 128
    hidden_edge_dim: int = 128
    hidden_coord_dim: int = 128
    num_layers: int = 6
    node_input_dim: int = 2
    edge_attr_dim: int = 4
    activation: str = "silu"
    coords_weight: float = 1.0
    recurrent: bool = True
    norm_diff: bool = True
    tanh: bool = True
    num_targets: int = 2
    use_pallas: bool = False  # fused message kernel (TPU, silu only)
    pallas_tile: int = 32  # receiver rows per kernel program
    streaming: bool = False  # sender-tile streaming kernel (TPU, silu
    # only): per-edge geometry/featurization computed in-kernel, no
    # [B,N,N,*] HBM tensors — the big-N path (ops/pallas/egnn_stream.py)
    stream_tile_j: int = 128  # sender columns per kernel program
    stream_elem_bf16: bool = False  # streaming kernel's [TI,TJ,He]
    # elementwise stack (silus + mask multiply) in bf16 for 2x VPU packing
    body_ring: bool = False  # body-sharded ring message pass (FC graphs;
    # apply() must run inside shard_map over the body mesh axis — see
    # parallel.sharded.make_body_ring_rollout_fn)
    fc_fast: bool = False  # fully-connected graphs only: drop the two
    # [B,N,N,He] mask-multiply VPU passes (exact for FC masks; see
    # _EGNNBlock).  The caller must guarantee the mask is fully connected
    # (num_neighbors == N-1), which is the reference's default workload.
    remat: bool = False  # jax.checkpoint each scanned layer in backprop:
    # O(1)-depth activation HBM at ~1/3 extra FLOPs, math unchanged
    compute_dtype: str = ""  # e.g. "bfloat16": hidden/message math in low
    # precision while coordinates, geometry and integration stay in the
    # scene dtype (f32) — recovers full-precision rollout stability at
    # near-bf16 speed (the [B,N,N,He] message stack dominates)

    def featurize(self, scene: Scene, mask) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Node features and edge attributes of the egnn_mc dataloader
        (``egnn_mc_n_body_dataloader.py:37-59``)."""
        speed = jnp.linalg.norm(scene.vel, axis=-1, keepdims=True)
        x = jnp.concatenate([speed, scene.mass], axis=-1)  # [B,N,2]

        edge_vec = G.rel_positions(scene.pos)  # pos_i - pos_j
        dist_sq = jnp.sum(edge_vec * edge_vec, axis=-1, keepdims=True)
        dist = jnp.clip(G.safe_sqrt(dist_sq), 1e-12, None)
        direction = edge_vec / dist
        v_i = scene.vel[:, :, None, :]
        v_j = scene.vel[:, None, :, :]
        proj_i = jnp.sum(v_i * direction, axis=-1, keepdims=True)
        proj_j = jnp.sum(v_j * direction, axis=-1, keepdims=True)
        mass_prod = scene.mass[:, :, None, :] * scene.mass[:, None, :, :]
        edge_attr = jnp.concatenate([mass_prod, proj_i, proj_j, dist_sq], axis=-1)
        return x, edge_attr

    @nn.compact
    def __call__(self, scene: Scene, mask, train: bool = False):
        if self.streaming or self.body_ring:
            # the [B,N,N,4] edge attrs are featurized INSIDE the edge stage
            # from this O(N) tuple (egnn_stream.py / ring_egnn.py keep
            # dataloader parity)
            speed = jnp.linalg.norm(scene.vel, axis=-1, keepdims=True)
            x = jnp.concatenate([speed, scene.mass], axis=-1)
            edge_attr = (scene.pos, scene.mass)
        else:
            x, edge_attr = self.featurize(scene, mask)
        h = TorchLinear(self.hidden_node_dim)(x)
        if self.compute_dtype:
            h = h.astype(jnp.dtype(self.compute_dtype))
        coord = scene.pos
        velocity = scene.vel

        scan = nn.scan(
            nn.remat(_EGNNBlock) if self.remat else _EGNNBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,) * 3,
            length=self.num_layers,
        )(
            hidden_node_dim=self.hidden_node_dim,
            hidden_edge_dim=self.hidden_edge_dim,
            hidden_coord_dim=self.hidden_coord_dim,
            edge_attr_dim=self.edge_attr_dim,
            activation=self.activation,
            coords_weight=self.coords_weight,
            recurrent=self.recurrent,
            norm_diff=self.norm_diff,
            tanh=self.tanh,
            use_pallas=self.use_pallas,
            pallas_tile=self.pallas_tile,
            fc_fast=self.fc_fast,
            streaming=self.streaming,
            stream_tile_j=self.stream_tile_j,
            stream_elem_bf16=self.stream_elem_bf16,
            body_ring=self.body_ring,
            # pinned so remat=True/False share one param tree
            name="Scan_EGNNBlock_0",
        )
        (h, coord), _ = scan((h, coord), velocity, edge_attr, mask)

        pos_dt = coord - scene.pos
        head_in = jnp.concatenate([h, pos_dt, velocity], axis=-1)
        outs = [
            MLP(
                hidden=[self.hidden_node_dim, self.hidden_node_dim],
                out=3,
                activation=self.activation,
            )(head_in)
            for _ in range(self.num_targets)
        ]
        return jnp.concatenate(outs, axis=-1)

    def get_model_size(self) -> int:
        """Width used by the Noam LR schedule (``egnn_mc.py:305-306``)."""
        return self.hidden_node_dim
