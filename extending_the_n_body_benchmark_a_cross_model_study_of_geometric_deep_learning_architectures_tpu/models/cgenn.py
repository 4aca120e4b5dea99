"""CGENN: Clifford group-equivariant network — dense TPU build.

Re-design of ``models/CGENN/`` on the from-scratch Cl(3) tables in
:mod:`..ops.clifford`.  Node state is ``[B, N, C, 8]`` multivectors; the
geometric product is one ``[8,8,8]`` einsum per layer.

Layer-by-layer mapping (reference source):
* ``MVLinear``            (``linear.py:9-60``):   per-subspace channel mixing,
  scalar-blade bias; ``subspaces=False`` for the embedding.
* ``MVSiLU``              (``mvsilu.py:9-53``):   sigmoid gate from per-grade
  quadratic forms (``mag2``, ``norms.py:q``) with affine (a, b) params.
* ``SteerableGeometricProductLayer`` (``gp.py:12-76``): weighted geometric
  product with per-grade-path weights + first-order linear term, ``/sqrt 2``.
* ``NormalizationLayer``  (``normalization.py:10-29``): sigmoid-interpolated
  per-grade norm normalisation of the right operand.
* ``MVLayerNorm``         (``mvlayernorm.py:10-25``): channel-mean magnitude
  normalisation.
* ``CEMLP`` / ``EGCL``    (``nbody_cgenn.py:24-169``): 2-layer Clifford MLPs
  for edge/node models, ``h_i - h_j`` messages, masked segment-mean
  aggregation, residual update.
* metric handling          (``nbody_cgenn.py:207-219, 267-302``): the frozen
  "learnable" metric's eigen-decomposition is precomputed at init instead of
  ``torch.linalg.eig`` every forward (SURVEY.md §7 hard part 5); inputs are
  rotated into the eigenbasis and predictions rotated back.

Inputs per the cgenn dataloader (charges ≡ masses for gravity): scalar mass
embedded grade-0, centred positions + velocities embedded grade-1.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core import graph as G
from ..core.scene import Scene
from ..ops import clifford as cl


def _normal_init(std):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


class MVLinear(nn.Module):
    """Channel mixing per blade subspace (``linear.py``)."""

    algebra_sig: tuple
    out_features: int
    subspaces: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):  # x [..., C_in, 8]
        c_in = x.shape[-2]
        if self.subspaces:
            w = self.param(
                "weight",
                _normal_init(1.0 / math.sqrt(c_in)),
                (self.out_features, c_in, 4),
            )
            w8 = jnp.repeat(w, np.asarray(cl.SUBSPACES), axis=-1)  # [O, I, 8]
            out = jnp.einsum("...mi,nmi->...ni", x, w8.astype(x.dtype))
        else:
            w = self.param(
                "weight",
                _normal_init(1.0 / math.sqrt(c_in)),
                (self.out_features, c_in),
            )
            out = jnp.einsum("...mi,nm->...ni", x, w.astype(x.dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_features,))
            out = out.at[..., 0].add(b.astype(x.dtype))
        return out


def grade_mag2(x, cayley):
    """Per-grade quadratic form q(x) (``norms.py:q`` with ``mag2``):
    scalar-blade component of ``beta(x) * x`` restricted per grade.

    x [..., C, 8] -> [..., C, 4]."""
    beta = jnp.asarray(cl.BETA_SIGNS, x.dtype)
    # q_i contribution: beta_i * x_i * C[i, 0, k] * x_k  summed within grade
    c0 = cayley[:, 0, :]  # [8, 8]
    full = (beta * x) * jnp.einsum("ik,...k->...i", c0.astype(x.dtype), x)
    return jnp.stack(
        [full[..., s].sum(-1) for s in cl.GRADE_SLICES], axis=-1
    )


def _smooth_abs_sqrt(q, eps=1e-16):
    return (q * q + eps) ** 0.25


class MVSiLU(nn.Module):
    """Gated nonlinearity (``mvsilu.py``)."""

    algebra_sig: tuple
    channels: int

    @nn.compact
    def __call__(self, x):
        cayley = jnp.asarray(cl.cayley_table(self.algebra_sig), x.dtype)
        a = self.param("a", nn.initializers.ones, (self.channels, 4))
        b = self.param("b", nn.initializers.zeros, (self.channels, 4))
        q = grade_mag2(x, cayley)  # [..., C, 4]
        invariants = jnp.concatenate([x[..., :1], q[..., 1:]], axis=-1)
        gates = a.astype(x.dtype) * invariants + b.astype(x.dtype)
        gates8 = jnp.repeat(gates, np.asarray(cl.SUBSPACES), axis=-1)
        return jax.nn.sigmoid(gates8) * x


class _Normalization(nn.Module):
    """Right-operand norm interpolation (``normalization.py``)."""

    algebra_sig: tuple
    features: int
    init: float = 0.0

    @nn.compact
    def __call__(self, x):
        cayley = jnp.asarray(cl.cayley_table(self.algebra_sig), x.dtype)
        a = self.param(
            "a", lambda k, s: jnp.full(s, self.init, jnp.float32), (self.features, 4)
        )
        norms = _smooth_abs_sqrt(grade_mag2(x, cayley))  # [..., C, 4]
        s_a = jax.nn.sigmoid(a.astype(x.dtype))
        norms = s_a * (norms - 1.0) + 1.0
        norms8 = jnp.repeat(norms, np.asarray(cl.SUBSPACES), axis=-1)
        return x / (norms8 + 1e-6)


class SteerableGeometricProduct(nn.Module):
    """Weighted geometric product layer (``gp.py``)."""

    algebra_sig: tuple
    features: int
    normalization_init: float | None = 0.0
    include_first_order: bool = True

    @nn.compact
    def __call__(self, x):
        cayley = jnp.asarray(cl.cayley_table(self.algebra_sig), jnp.float32)
        paths = cl.geometric_product_paths()  # bool [4,4,4]
        n_paths = int(paths.sum())
        w = self.param(
            "weight", _normal_init(1.0 / math.sqrt(cl.DIM + 1)), (self.features, n_paths)
        )
        # scatter path weights into the [4,4,4] grade grid, expand to blades
        pidx = np.argwhere(paths)  # [n_paths, 3] static
        w_grid = jnp.zeros((self.features, 4, 4, 4), w.dtype)
        w_grid = w_grid.at[:, pidx[:, 0], pidx[:, 1], pidx[:, 2]].set(w)
        w8 = jnp.repeat(w_grid, np.asarray(cl.SUBSPACES), axis=-3)
        w8 = jnp.repeat(w8, np.asarray(cl.SUBSPACES), axis=-2)
        w8 = jnp.repeat(w8, np.asarray(cl.SUBSPACES), axis=-1)
        weight = cayley * w8  # [C, 8, 8, 8]

        x_right = MVLinear(self.algebra_sig, self.features, use_bias=False)(x)
        if self.normalization_init is not None:
            x_right = _Normalization(
                self.algebra_sig, self.features, self.normalization_init
            )(x_right)
        gp = jnp.einsum("...ni,nijk,...nk->...nj", x, weight.astype(x.dtype), x_right)
        if self.include_first_order:
            lin = MVLinear(self.algebra_sig, self.features, use_bias=True)(x)
            return (lin + gp) / math.sqrt(2.0)
        return gp


class MVLayerNorm(nn.Module):
    algebra_sig: tuple
    channels: int

    @nn.compact
    def __call__(self, x):
        cayley = jnp.asarray(cl.cayley_table(self.algebra_sig), x.dtype)
        a = self.param("a", nn.initializers.ones, (self.channels,))
        q_total = grade_mag2(x, cayley).sum(-1, keepdims=True)  # full-mv q
        norm = _smooth_abs_sqrt(q_total).mean(axis=-2, keepdims=True) + 1e-6
        return a.astype(x.dtype)[..., :, None] * x / norm


class CEMLP(nn.Module):
    """(MVLinear -> MVSiLU -> GP -> MVLayerNorm) x n (``nbody_cgenn.py:24-86``)."""

    algebra_sig: tuple
    hidden_features: int
    out_features: int
    n_layers: int = 2
    normalization_init: float | None = 0.0

    @nn.compact
    def __call__(self, x):
        feats = [self.hidden_features] * (self.n_layers - 1) + [self.out_features]
        for f in feats:
            x = MVLinear(self.algebra_sig, f)(x)
            x = MVSiLU(self.algebra_sig, f)(x)
            x = SteerableGeometricProduct(
                self.algebra_sig, f, self.normalization_init
            )(x)
            x = MVLayerNorm(self.algebra_sig, f)(x)
        return x


class _EGCL(nn.Module):
    """Clifford message-passing layer (``nbody_cgenn.py:89-169``)."""

    algebra_sig: tuple
    hidden_features: int
    residual: bool = True
    normalization_init: float | None = 0.0

    @nn.compact
    def __call__(self, h, mask):
        """h [B, N, C, 8]; mask [B, N, N] (receiver i aggregates over j)."""
        h_i = h[:, :, None]  # receiver
        h_j = h[:, None, :, :]  # sender
        msg = CEMLP(
            self.algebra_sig,
            self.hidden_features,
            self.hidden_features,
            normalization_init=self.normalization_init,
        )(h_i - h_j)  # [B,N,N,C,8]
        agg = G.masked_segment_mean(msg, mask)
        out = CEMLP(
            self.algebra_sig,
            self.hidden_features,
            self.hidden_features,
            normalization_init=self.normalization_init,
        )(jnp.concatenate([h, agg], axis=-2))
        return (h + out, None) if self.residual else (out, None)


class CGENN(nn.Module):
    """``__call__(scene, mask) -> [B, N, 6]`` (pos_dt ‖ vel)."""

    hidden_features: int = 96
    num_layers: int = 4
    in_features: int = 3
    out_features: int = 2
    normalization_init: float | None = 0.0
    residual: bool = True
    metric_seed: int = 0
    remat: bool = False  # jax.checkpoint each scanned layer in backprop:
    # O(1)-depth activation HBM at ~1/3 extra FLOPs, math unchanged

    @nn.compact
    def __call__(self, scene: Scene, mask, train: bool = False):
        eigvals, P, P_inv = cl.reference_metric(self.metric_seed)
        sig = tuple(float(v) for v in eigvals)
        Pj = jnp.asarray(P, scene.pos.dtype)
        P_invj = jnp.asarray(P_inv, scene.pos.dtype)

        loc_mean = scene.pos - jnp.mean(scene.pos, axis=1, keepdims=True)
        loc_r = loc_mean @ Pj
        vel_r = scene.vel @ Pj
        charges = scene.charge if scene.charge is not None else scene.mass

        B, N = scene.pos.shape[:2]
        mv = jnp.zeros((B, N, self.in_features, cl.N_BLADES), scene.pos.dtype)
        mv = mv.at[:, :, 0, 0].set(charges[..., 0])  # invariants grade 0
        mv = mv.at[:, :, 1, 1:4].set(loc_r)  # covariants grade 1
        mv = mv.at[:, :, 2, 1:4].set(vel_r)

        h = MVLinear(sig, self.hidden_features, subspaces=False)(mv)
        scan = nn.scan(
            nn.remat(_EGCL) if self.remat else _EGCL,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            length=self.num_layers,
        )(
            algebra_sig=sig,
            hidden_features=self.hidden_features,
            residual=self.residual,
            normalization_init=self.normalization_init,
            # pinned so remat=True/False share one param tree
            name="Scan_EGCL_0",
        )
        h, _ = scan(h, mask)
        pred = MVLinear(sig, self.out_features)(h)  # [B,N,2,8]

        loc_pred = pred[..., 0, 1:4]
        vel_pred = pred[..., 1, 1:4]
        # absolute prediction in eigenbasis, then back (nbody_cgenn.py:284-302)
        loc_abs = ((scene.pos @ Pj) + loc_pred) @ P_invj
        vel_abs = (vel_r + vel_pred) @ P_invj
        pos_dt = loc_abs - scene.pos @ Pj @ P_invj
        return jnp.concatenate([pos_dt, vel_abs], axis=-1)

    def get_model_size(self) -> int:
        return self.hidden_features
