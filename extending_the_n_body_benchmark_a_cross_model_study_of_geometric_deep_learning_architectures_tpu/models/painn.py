"""PaiNN (polarizable atom interaction NN) — dense TPU formulation.

Re-design of ``models/PaiNN/PaiNN.py`` (torch + torch_scatter).  State per
node: scalar features ``q [B,N,H]`` and vector features ``mu [B,N,3,H]``.
Messages use Gaussian-RBF × cosine-cutoff filters; aggregation is a masked,
degree-normalised mean (``PaiNN.py:143-169``).  The optional stability
toggles of the reference (tanh-squashed messages, clipped aggregates,
residual scaling, filter gain — ``PaiNN.py:91-105``, recommended values in
``docs/ablations/painn_ablation.md``) are reproduced as config fields.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..core import graph as G
from ..core.scene import Scene
from .common import MLP, get_activation, xavier_uniform_gain


class EquivariantLinear(nn.Module):
    """Feature-mixing linear over the channel axis of ``[..., 3, F]`` vectors
    (``PaiNN.py:67-80``); no bias to preserve equivariance."""

    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", xavier_uniform_gain(1.0), (x.shape[-1], self.features))
        return jnp.einsum("...cf,fo->...co", x, w.astype(x.dtype))


def _tanh_scale(x, s: Optional[float]):
    return x if s is None else jnp.tanh(x / s) * s


class _Interaction(nn.Module):
    """Message block (``PaiNN.py:83-208``)."""

    hidden: int
    residual_scale: float = 1.0
    tanh_message_scale: Optional[float] = None
    clip_scalar_msg_value: Optional[float] = None
    clip_vector_msg_norm: Optional[float] = None
    filter_gain: float = 1.0

    @nn.compact
    def __call__(self, q, mu, rbf, unit, cutoff_vals, mask):
        H = self.hidden
        act = get_activation("silu")

        filters = MLP(hidden=[H], out=3 * H, activation="silu")(rbf)
        filters = filters * cutoff_vals[..., None]
        if self.filter_gain != 1.0:
            filters = filters * self.filter_gain
        f_q, f_r, f_mu = jnp.split(filters, 3, axis=-1)  # [B,N,N,H] each

        x = MLP(hidden=[3 * H], out=3 * H, activation="silu")(q)
        x_q, x_r, x_mu = jnp.split(x, 3, axis=-1)  # [B,N,H]

        # Messages flow sender j -> receiver i: source features indexed at j.
        x_q_src = x_q[:, None, :, :] * f_q
        x_r_src = x_r[:, None, :, :] * f_r
        x_mu_src = x_mu[:, None, :, :] * f_mu
        x_q_src = _tanh_scale(x_q_src, self.tanh_message_scale)
        x_r_src = _tanh_scale(x_r_src, self.tanh_message_scale)
        x_mu_src = _tanh_scale(x_mu_src, self.tanh_message_scale)

        scalar_msg = G.masked_segment_mean(x_q_src, mask)  # sum/deg (PaiNN.py:165-169)

        mu_j = mu[:, None, :, :, :]  # [B,1,N,3,H] sender vectors
        vec_new = unit[..., None] * x_r_src[..., None, :]  # [B,N,N,3,H]
        vec_prop = mu_j * x_mu_src[..., None, :]
        vector_msg = G.masked_segment_mean(vec_new + vec_prop, mask)

        if self.clip_scalar_msg_value is not None:
            c = self.clip_scalar_msg_value
            scalar_msg = jnp.clip(scalar_msg, -c, c)
        if self.clip_vector_msg_norm is not None:
            c = self.clip_vector_msg_norm
            vnorm = jnp.sqrt(jnp.sum(vector_msg**2, axis=-2) + 1e-12)
            scale = jnp.clip(c / (vnorm + 1e-12), None, 1.0)
            vector_msg = vector_msg * scale[..., None, :]

        q = q + self.residual_scale * scalar_msg
        mu = mu + self.residual_scale * vector_msg
        del act
        return q, mu


class _Mixing(nn.Module):
    """Equivariant mixing block (``PaiNN.py:211-288``)."""

    hidden: int
    residual_scale: float = 1.0
    tanh_mixing_scale: Optional[float] = None
    clip_mu_norm: Optional[float] = None
    clip_q_value: Optional[float] = None

    @nn.compact
    def __call__(self, q, mu):
        H = self.hidden
        mu_cat = EquivariantLinear(2 * H)(mu)  # [B,N,3,2H]
        mu_v, mu_w = jnp.split(mu_cat, 2, axis=-1)

        mu_v_norm = jnp.sqrt(jnp.sum(mu_v**2, axis=-2) + 1e-8)  # [B,N,H]
        delta = MLP(hidden=[3 * H], out=3 * H, activation="silu")(
            jnp.concatenate([q, mu_v_norm], axis=-1)
        )
        dq, dmu_scale, dqmu = jnp.split(delta, 3, axis=-1)
        dq = _tanh_scale(dq, self.tanh_mixing_scale)
        dmu_scale = _tanh_scale(dmu_scale, self.tanh_mixing_scale)
        dqmu = _tanh_scale(dqmu, self.tanh_mixing_scale)

        inner = jnp.sum(mu_v * mu_w, axis=-2)  # [B,N,H]
        q = q + self.residual_scale * (dq + dqmu * inner)
        mu = mu + self.residual_scale * (mu_w * dmu_scale[..., None, :])

        if self.clip_q_value is not None:
            q = jnp.clip(q, -self.clip_q_value, self.clip_q_value)
        if self.clip_mu_norm is not None:
            c = self.clip_mu_norm
            mu_norm = jnp.sqrt(jnp.sum(mu**2, axis=-2) + 1e-12)
            scale = jnp.clip(c / (mu_norm + 1e-12), None, 1.0)
            mu = mu * scale[..., None, :]
        return q, mu


class _Readout(nn.Module):
    """Gated vector readout (``PaiNN.py:332-350``)."""

    hidden: int
    vector_outputs: int = 1

    @nn.compact
    def __call__(self, q, mu):
        gate = MLP(hidden=[self.hidden], out=self.hidden, activation="silu")(q)
        mu_gated = mu * gate[:, :, None, :]
        mu_proj = EquivariantLinear(self.hidden)(mu_gated)
        return EquivariantLinear(self.vector_outputs)(mu_proj)  # [B,N,3,V]


class _PaiNNBlock(nn.Module):
    """Interaction + mixing pair (``PaiNN.py:291-329``), scan-compatible."""

    hidden: int
    residual_scale_interaction: float = 1.0
    residual_scale_mixing: float = 1.0
    tanh_message_scale: Optional[float] = None
    tanh_mixing_scale: Optional[float] = None
    clip_scalar_msg_value: Optional[float] = None
    clip_vector_msg_norm: Optional[float] = None
    clip_q_value: Optional[float] = None
    clip_mu_norm: Optional[float] = None
    filter_gain: float = 1.0

    @nn.compact
    def __call__(self, carry, rbf, unit, cut, mask):
        q, mu = carry
        q, mu = _Interaction(
            hidden=self.hidden,
            residual_scale=self.residual_scale_interaction,
            tanh_message_scale=self.tanh_message_scale,
            clip_scalar_msg_value=self.clip_scalar_msg_value,
            clip_vector_msg_norm=self.clip_vector_msg_norm,
            filter_gain=self.filter_gain,
        )(q, mu, rbf, unit, cut, mask)
        q, mu = _Mixing(
            hidden=self.hidden,
            residual_scale=self.residual_scale_mixing,
            tanh_mixing_scale=self.tanh_mixing_scale,
            clip_mu_norm=self.clip_mu_norm,
            clip_q_value=self.clip_q_value,
        )(q, mu)
        return (q, mu), None


class PaiNN(nn.Module):
    """Full PaiNN for n-body targets (``PaiNN.py:353-500``).

    ``__call__(scene, mask) -> [B, N, 6]`` = (pos_dt ‖ vel) with the velocity
    head residual on the input velocity (``PaiNN.py:487-489``).
    """

    hidden_features: int = 192
    num_layers: int = 6
    num_rbf: int = 64
    cutoff: float = 10.0
    use_velocity_input: bool = True
    include_velocity_norm: bool = True
    residual_scale_interaction: float = 1.0
    residual_scale_mixing: float = 1.0
    tanh_message_scale: Optional[float] = None
    tanh_mixing_scale: Optional[float] = None
    clip_scalar_msg_value: Optional[float] = None
    clip_vector_msg_norm: Optional[float] = None
    clip_q_value: Optional[float] = None
    clip_mu_norm: Optional[float] = None
    filter_gain: float = 1.0
    remat: bool = False  # jax.checkpoint each scanned layer in backprop:
    # O(1)-depth activation HBM at ~1/3 extra FLOPs, math unchanged

    @nn.compact
    def __call__(self, scene: Scene, mask, train: bool = False):
        H = self.hidden_features
        feats = [scene.mass]
        if self.include_velocity_norm:
            feats.append(jnp.linalg.norm(scene.vel, axis=-1, keepdims=True))
        scalar_in = jnp.concatenate(feats, axis=-1)

        q = MLP(hidden=[H], out=H, activation="silu")(scalar_in)
        if self.use_velocity_input:
            vscale = MLP(hidden=[H], out=H, activation="silu")(scalar_in)
            mu = scene.vel[..., None] * vscale[:, :, None, :]  # [B,N,3,H]
        else:
            mu = jnp.zeros(scene.pos.shape[:2] + (3, H), scene.pos.dtype)

        # Edge geometry: edge_vectors = pos_j - pos_i (PaiNN.py:473-478).
        edge_vec = -G.rel_positions(scene.pos)
        unit, dist = G.safe_unit(edge_vec)
        rbf = G.gaussian_rbf(dist, self.num_rbf, self.cutoff)
        cut = G.cosine_cutoff(dist, self.cutoff)

        scan = nn.scan(
            nn.remat(_PaiNNBlock) if self.remat else _PaiNNBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,) * 4,
            length=self.num_layers,
        )(
            hidden=H,
            residual_scale_interaction=self.residual_scale_interaction,
            residual_scale_mixing=self.residual_scale_mixing,
            tanh_message_scale=self.tanh_message_scale,
            tanh_mixing_scale=self.tanh_mixing_scale,
            clip_scalar_msg_value=self.clip_scalar_msg_value,
            clip_vector_msg_norm=self.clip_vector_msg_norm,
            clip_q_value=self.clip_q_value,
            clip_mu_norm=self.clip_mu_norm,
            filter_gain=self.filter_gain,
            # pinned so remat=True/False share one param tree
            name="Scan_PaiNNBlock_0",
        )
        (q, mu), _ = scan((q, mu), rbf, unit, cut, mask)

        pos_delta = _Readout(hidden=H)(q, mu)[..., 0]  # [B,N,3]
        vel_delta = _Readout(hidden=H)(q, mu)[..., 0]
        vel_pred = scene.vel + vel_delta
        return jnp.concatenate([pos_delta, vel_pred], axis=-1)

    def get_model_size(self) -> int:
        return self.hidden_features
