"""SEGNN: steerable E(3)-equivariant message passing — dense TPU build.

Re-design of ``models/segnn/segnn.py`` + ``o3_building_blocks.py`` on the
from-scratch steerable stack (:mod:`..ops.steerable`) instead of e3nn:

* hidden irreps via ``WeightBalancedIrreps`` (``models/balanced_irreps.py:
  51-85``) — e.g. ``48x0e+48x1o`` for 96 features at lmax 1;
* each layer: 2 gated tensor-product message layers steered by edge SH
  attrs, scatter-add aggregation, 2 update layers steered by node SH attrs,
  residual (``segnn.py:264-304``);
* featurization = ``O3Transform`` (``o3_building_blocks.py:225-278``):
  edge attr = SH(rel_pos), node attr = mean of incident edge SH + SH(vel),
  node features ``[pos - mean, vel, |v|]`` (2x1o + 1x0e), additional message
  features ``[dist, m_i * m_j]`` (2x0e).

Basis note: physical 3-vectors are packed into 1o slots in the internal
(y, z, x) SH basis and unpacked on output, keeping every 1o quantity in one
consistent basis — which makes the network *exactly* O(3)-equivariant.

``center_mode``: the reference computes ``pos.mean(1, keepdims=True)`` over
the *coordinate* axis (``o3_building_blocks.py:274``) — a per-node scalar
offset, not the CoM.  ``"coords"`` (default) reproduces that;
``"nodes"`` subtracts the per-simulation CoM (the original SEGNN paper's
behaviour, and exactly rotation-equivariant).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..core import graph as G
from ..core.scene import Scene
from ..ops.steerable import (
    GateActivation,
    Irreps,
    SteerableTensorProduct,
    SteerableTPSwishGate,
    gate_irreps,
    spherical_harmonics,
    weight_balanced_irreps,
)

_TO_YZX = (1, 2, 0)
_TO_XYZ = (2, 0, 1)


def vec_to_1o(v: jnp.ndarray) -> jnp.ndarray:
    """Pack a physical (x, y, z) vector into the internal 1o basis (y, z, x)."""
    return v[..., _TO_YZX]


def irrep1o_to_vec(u: jnp.ndarray) -> jnp.ndarray:
    return u[..., _TO_XYZ]


class _SEGNNLayer(nn.Module):
    """One message-passing layer (``segnn.py:192-304``), dense formulation.

    Wrapped in ``nn.scan`` by :class:`SEGNN` so XLA compiles one layer body
    for any depth (the reference stacks 20 of these)."""

    input_irreps: Irreps
    hidden_irreps: Irreps
    edge_attr_irreps: Irreps
    node_attr_irreps: Irreps
    additional_message_irreps: Irreps
    norm: str | None = None

    @nn.compact
    def __call__(self, x, edge_sh, node_attr, additional, adj):
        """x [B,N,D]; edge_sh/additional [B,N,N,*] indexed (receiver, sender);
        adj [B,N,N] bool."""
        n = x.shape[1]
        message_in_irreps = (
            self.input_irreps + self.input_irreps + self.additional_message_irreps
        )
        update_in_irreps = self.input_irreps + self.hidden_irreps

        x_r = jnp.broadcast_to(x[:, :, None, :], x.shape[:1] + (n, n, x.shape[-1]))
        x_s = jnp.broadcast_to(x[:, None, :, :], x.shape[:1] + (n, n, x.shape[-1]))
        # message(x_i, x_j, additional): receiver first (segnn.py:264-277)
        m_in = jnp.concatenate([x_r, x_s, additional], axis=-1)
        m = SteerableTPSwishGate(message_in_irreps, self.hidden_irreps, self.edge_attr_irreps)(
            m_in, edge_sh
        )
        m = SteerableTPSwishGate(self.hidden_irreps, self.hidden_irreps, self.edge_attr_irreps)(
            m, edge_sh
        )
        msg = G.masked_segment_sum(m, adj)  # aggr="add" (segnn.py:205)

        u_in = jnp.concatenate([x, msg], axis=-1)
        u = SteerableTPSwishGate(update_in_irreps, self.hidden_irreps, self.node_attr_irreps)(
            u_in, node_attr
        )
        u = SteerableTensorProduct(self.hidden_irreps, self.hidden_irreps, self.node_attr_irreps)(
            u, node_attr
        )
        x = x + u  # residual (segnn.py:303)
        if self.norm == "instance":  # feature norm (segnn.py:256-261)
            from ..ops.steerable import SteerableInstanceNorm

            x = SteerableInstanceNorm(self.hidden_irreps)(x)
        elif self.norm not in (None, "none"):
            raise NotImplementedError(f"norm '{self.norm}' not supported")
        return x, None  # (carry, out) for nn.scan


class SEGNN(nn.Module):
    """``__call__(scene, mask) -> [B, N, 6]`` (pos_dt ‖ vel, output 2x1o)."""

    hidden_features: int = 96
    lmax_attr: int = 1
    lmax_h: int = 1
    num_layers: int = 20
    normalization_type: str | None = None  # config.yaml sets null
    center_mode: str = "coords"  # reference parity; "nodes" = CoM subtract
    use_force_input: bool = False  # add SH(force) to node_attr (o3_building_blocks.py:267-271)
    remat: bool = False  # jax.checkpoint each scanned layer in backprop:
    # O(1)-depth activation HBM at ~1/3 extra FLOPs, math unchanged

    def setup(self):
        self.input_irreps = Irreps("1x1o+1x1o+1x0e")
        self.output_irreps = Irreps("1x1o+1x1o")
        self.attr_irreps = Irreps.spherical_harmonics(self.lmax_attr)
        self.additional_message_irreps = Irreps("2x0e")
        self.hidden_irreps = weight_balanced_irreps(
            self.hidden_features, self.attr_irreps, self.lmax_h
        )
        self.embedding = SteerableTensorProduct(
            self.input_irreps, self.hidden_irreps, self.attr_irreps
        )

        # one compiled layer body, scanned num_layers times (params stacked
        # on a leading depth axis)
        # (setup-style attribute keeps the "mp_scan" param name in both modes)
        self.mp_scan = nn.scan(
            nn.remat(_SEGNNLayer) if self.remat else _SEGNNLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,) * 4,
            length=self.num_layers,
        )(
            input_irreps=self.hidden_irreps,
            hidden_irreps=self.hidden_irreps,
            edge_attr_irreps=self.attr_irreps,
            node_attr_irreps=self.attr_irreps,
            additional_message_irreps=self.additional_message_irreps,
            norm=self.normalization_type,
        )
        self.pre_pool1 = SteerableTPSwishGate(
            self.hidden_irreps, self.hidden_irreps, self.attr_irreps
        )
        self.pre_pool2 = SteerableTensorProduct(
            self.hidden_irreps, self.output_irreps, self.attr_irreps
        )

    def featurize(self, scene: Scene, mask):
        """Dense ``O3Transform`` (``o3_building_blocks.py:230-278``)."""
        pos, vel, mass = scene.pos, scene.vel, scene.mass
        # receiver r / sender s layout: edges are (i=s, r=col=j) of the KNN
        # builder; PyG aggregates at edge_index[1] (SURVEY §3.3), so
        # adj[b, r, s] = mask[b, s, r] and rel = pos_s - pos_r.
        adj = jnp.swapaxes(mask, 1, 2)
        rel = -G.rel_positions(pos)  # [b, r, s] = pos_s - pos_r
        # spherical_harmonics consumes physical (x,y,z) vectors and already
        # emits components in the internal (y,z,x) irrep basis
        edge_sh = spherical_harmonics(self.lmax_attr, rel)
        dist = G.safe_sqrt(jnp.sum(rel * rel, axis=-1, keepdims=True))
        prod_mass = mass[:, :, None, :] * mass[:, None, :, :]
        additional = jnp.concatenate([dist, prod_mass], axis=-1)

        # node attr = mean of SH over edges incident at the receiver
        # (scatter-mean at edge_index[1], o3_building_blocks.py:256-265)
        node_attr = G.masked_segment_mean(edge_sh, adj) + spherical_harmonics(
            self.lmax_attr, vel
        )
        if self.use_force_input:
            node_attr = node_attr + spherical_harmonics(self.lmax_attr, scene.force)
        # trivial irrep of attrs must stay 1 (segnn.py:147-148)
        node_attr = node_attr.at[..., 0].set(1.0)

        if self.center_mode == "coords":
            centered = pos - jnp.mean(pos, axis=-1, keepdims=True)
        else:
            centered = pos - jnp.mean(pos, axis=1, keepdims=True)
        vel_abs = G.safe_sqrt(jnp.sum(vel * vel, axis=-1, keepdims=True))
        x = jnp.concatenate([vec_to_1o(centered), vec_to_1o(vel), vel_abs], axis=-1)
        return x, edge_sh, node_attr, additional, adj

    def __call__(self, scene: Scene, mask, train: bool = False):
        x, edge_sh, node_attr, additional, adj = self.featurize(scene, mask)
        x = self.embedding(x, node_attr)
        x, _ = self.mp_scan(x, edge_sh, node_attr, additional, adj)
        x = self.pre_pool1(x, node_attr)
        x = self.pre_pool2(x, node_attr)
        pos_dt = irrep1o_to_vec(x[..., 0:3])
        vel = irrep1o_to_vec(x[..., 3:6])
        return jnp.concatenate([pos_dt, vel], axis=-1)

    def get_model_size(self) -> int:
        return self.hidden_features


class _SEConvLayer(nn.Module):
    """Steerable conv layer (``models/segnn/seconv.py:136-241``): messages
    through one ('linear') or two ('nonlinear') tensor products into the
    gate irreps, scatter-add, gate, residual."""

    hidden_irreps: Irreps
    edge_attr_irreps: Irreps
    additional_message_irreps: Irreps
    conv_type: str = "linear"

    @nn.compact
    def __call__(self, x, edge_sh, node_attr, additional, adj):
        n = x.shape[1]
        message_in = (
            self.hidden_irreps + self.hidden_irreps + self.additional_message_irreps
        )
        irreps_g = gate_irreps(self.hidden_irreps)

        x_r = jnp.broadcast_to(x[:, :, None, :], x.shape[:1] + (n, n, x.shape[-1]))
        x_s = jnp.broadcast_to(x[:, None, :, :], x.shape[:1] + (n, n, x.shape[-1]))
        m_in = jnp.concatenate([x_r, x_s, additional], axis=-1)
        if self.conv_type == "linear":
            m = SteerableTensorProduct(message_in, irreps_g, self.edge_attr_irreps)(
                m_in, edge_sh
            )
        elif self.conv_type == "nonlinear":
            m = SteerableTPSwishGate(
                message_in, self.hidden_irreps, self.edge_attr_irreps
            )(m_in, edge_sh)
            m = SteerableTensorProduct(
                self.hidden_irreps, irreps_g, self.edge_attr_irreps
            )(m, edge_sh)
        else:
            raise ValueError(f"Invalid conv_type {self.conv_type}")
        msg = G.masked_segment_sum(m, adj)
        x = x + GateActivation(self.hidden_irreps)(msg)  # gate + residual
        return x, None


class SEConv(nn.Module):
    """Alternative steerable conv net (``models/segnn/seconv.py:12-133``) —
    present in the reference but registered nowhere; exposed here as model
    type 'seconv' with the SEGNN featurization."""

    hidden_features: int = 96
    lmax_attr: int = 1
    lmax_h: int = 1
    num_layers: int = 8
    conv_type: str = "linear"
    center_mode: str = "coords"
    remat: bool = False  # jax.checkpoint each scanned layer in backprop:
    # O(1)-depth activation HBM at ~1/3 extra FLOPs, math unchanged

    @nn.compact
    def __call__(self, scene: Scene, mask, train: bool = False):
        attr_irreps = Irreps.spherical_harmonics(self.lmax_attr)
        hidden_irreps = weight_balanced_irreps(
            self.hidden_features, attr_irreps, self.lmax_h
        )
        input_irreps = Irreps("1x1o+1x1o+1x0e")
        output_irreps = Irreps("1x1o+1x1o")

        helper = SEGNN(
            hidden_features=self.hidden_features,
            lmax_attr=self.lmax_attr,
            lmax_h=self.lmax_h,
            num_layers=0,
            center_mode=self.center_mode,
        )
        x, edge_sh, node_attr, additional, adj = helper.featurize(scene, mask)

        x = SteerableTensorProduct(input_irreps, hidden_irreps, attr_irreps)(
            x, node_attr
        )
        scan = nn.scan(
            nn.remat(_SEConvLayer) if self.remat else _SEConvLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,) * 4,
            length=self.num_layers,
        )(
            hidden_irreps=hidden_irreps,
            edge_attr_irreps=attr_irreps,
            additional_message_irreps=Irreps("2x0e"),
            conv_type=self.conv_type,
            # pinned so remat=True/False share one param tree
            name="Scan_SEConvLayer_0",
        )
        x, _ = scan(x, edge_sh, node_attr, additional, adj)
        x = SteerableTPSwishGate(hidden_irreps, hidden_irreps, attr_irreps)(x, node_attr)
        x = SteerableTensorProduct(hidden_irreps, output_irreps, attr_irreps)(x, node_attr)
        return jnp.concatenate(
            [irrep1o_to_vec(x[..., 0:3]), irrep1o_to_vec(x[..., 3:6])], axis=-1
        )

    def get_model_size(self) -> int:
        return self.hidden_features
