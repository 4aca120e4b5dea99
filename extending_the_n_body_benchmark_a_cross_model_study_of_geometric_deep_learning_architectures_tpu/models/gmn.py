"""GMN: Graph Mechanics Network with rigid-object constraint updates.

Dense TPU re-design of the vendored ``models/GMN/GMN.py`` (not registered in
the reference config — kept for parity with the offline constrained
dataset).  Per layer (``GMN.py:29-424``):

* EGNN-style invariant edge messages + clamped equivariant "force"
  aggregation (``edge_model``/``coord_model``, ``GMN.py:144-188``),
* per-object generalized-coordinate updates (``GMN.py:190-370``):
  - Isolated: gated velocity + force Euler step,
  - Stick: learned basis force -> CoM acceleration, angular velocity from
    torque, Rodrigues rotation of the half-separation vector,
  - Hinge: pivot + two constrained beams,
* residual scalar feature update (``node_model``).

Objects live in contiguous node blocks ``[isolated | stick pairs | hinge
triples]`` (matching :mod:`..data.offline_datagen`); the object composition
is static model config, so every update is a fixed-shape vmapped slice.

Inputs: ``h = [|v|, charge]`` per node, edge attr ``q_i q_j``; output
``[B, N, 6]`` = (x_final - x_0 ‖ v_final).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import graph as G
from ..core.scene import Scene
from .common import MLP, TorchLinear, xavier_uniform_gain


def _rodrigues_batched(theta, d):
    """``GMN.compute_rotation_matrix`` (``GMN.py:404-424``)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    C = 1 - c
    rows = [
        c + C * x * x, C * x * y - s * z, C * x * z + s * y,
        C * x * y + s * z, c + C * y * y, C * y * z - s * x,
        C * x * z - s * y, C * y * z + s * x, c + C * z * z,
    ]
    return jnp.stack(rows, axis=-1).reshape(theta.shape + (3, 3))


def _normalize(v, eps=1e-12):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


class _GMNLayer(nn.Module):
    hidden: int
    edge_attr_dim: int = 1
    coords_weight: float = 1.0
    recurrent: bool = False
    norm_diff: bool = False
    tanh: bool = False
    n_isolated: int = 5
    n_stick: int = 0
    n_hinge: int = 0

    @nn.compact
    def __call__(self, carry, edge_attr, mask):
        h, x, v = carry
        H = self.hidden
        B, N = x.shape[:2]

        # --- invariant messages + equivariant force (GMN.py:144-188)
        coord_diff = G.rel_positions(x)
        radial = jnp.sum(coord_diff * coord_diff, axis=-1, keepdims=True)
        if self.norm_diff:
            coord_diff = coord_diff / (G.safe_sqrt(radial) + 1.0)
        h_i = jnp.broadcast_to(h[:, :, None, :], (B, N, N, H))
        h_j = jnp.broadcast_to(h[:, None, :, :], (B, N, N, H))
        edge_feat = MLP([H], H, activation="silu", final_act=True)(
            jnp.concatenate([h_i, h_j, radial, edge_attr], axis=-1)
        )
        w = TorchLinear(H)(edge_feat)
        w = jax.nn.silu(w)
        w = nn.Dense(1, use_bias=False, kernel_init=xavier_uniform_gain(0.001),
                     dtype=w.dtype, param_dtype=jnp.float32)(w)
        if self.tanh:
            # the reference *declares* coords_range (GMN.py:137) but its
            # coord_model never applies it (GMN.py:172-178) — keep the
            # parameter for param-count parity, leave it out of the math
            self.param("coords_range", nn.initializers.constant(3.0), (1,))
            w = jnp.tanh(w)
        trans = jnp.clip(w * coord_diff, -100.0, 100.0)
        f = G.masked_segment_mean(trans, mask) * self.coords_weight  # [B,N,3]

        # --- gates
        gate_vel = MLP([H], 1, activation="silu")  # coord_mlp_vel
        gate_w = MLP([H], 1, activation="silu")  # coord_mlp_w_vel
        center = MLP([H], H, activation="silu")  # center_mlp
        f_stick = MLP([H], 1, activation="silu")
        f_hinge = MLP([H], 3, activation="silu")

        iso, st, hi = self.n_isolated, self.n_stick, self.n_hinge
        iso_sl = slice(0, iso)
        st_sl = slice(iso, iso + 2 * st)
        hi_sl = slice(iso + 2 * st, N)

        if iso:
            gv = gate_vel(h[:, iso_sl])
            v_new = gv * v[:, iso_sl] + f[:, iso_sl]
            v = v.at[:, iso_sl].set(v_new)
            x = x.at[:, iso_sl].set(x[:, iso_sl] + v_new)

        if st:
            xs = x[:, st_sl].reshape(B, st, 2, 3)
            vs = v[:, st_sl].reshape(B, st, 2, 3)
            fs = f[:, st_sl].reshape(B, st, 2, 3)
            hs = h[:, st_sl].reshape(B, st, 2, H)
            x0 = xs.mean(axis=2)
            v0 = vs.mean(axis=2)
            # learned basis force per node: basis = (f,) (GMN.py:215-224)
            inv = _normalize(jnp.sum(fs * fs, axis=-1, keepdims=True))
            msg = f_stick(inv)  # [B,S,2,1]
            a0 = jnp.mean(msg * fs, axis=2)  # [B,S,3]

            r = (xs[:, :, 0] - xs[:, :, 1]) / 2.0
            rel_v = (vs[:, :, 0] - vs[:, :, 1]) / 2.0
            r_norm = jnp.sqrt(jnp.sum(r * r, axis=-1, keepdims=True))
            w_vec = jnp.cross(_normalize(r), rel_v) / jnp.clip(r_norm, 1e-5, None)
            J = jnp.sum((xs[:, :, 0] - x0) ** 2, -1, keepdims=True) + jnp.sum(
                (xs[:, :, 1] - x0) ** 2, -1, keepdims=True
            )
            beta = (
                jnp.cross(xs[:, :, 0] - x0, fs[:, :, 0])
                + jnp.cross(xs[:, :, 1] - x0, fs[:, :, 1])
            ) / J
            h_c = center(hs[:, :, 0]) + center(hs[:, :, 1])
            w_vec = gate_w(h_c) * w_vec + beta
            v0 = gate_vel(h_c) * v0 + a0
            x0 = x0 + v0
            theta = jnp.sqrt(jnp.sum(w_vec * w_vec, axis=-1) + 1e-30)
            rot = _rodrigues_batched(theta, _normalize(w_vec))
            r = jnp.einsum("bsij,bsj->bsi", rot, r)
            x1, x2 = x0 + r, x0 - r
            v1 = v0 + jnp.cross(w_vec, r)
            v2 = v0 + jnp.cross(w_vec, -r)
            x = x.at[:, st_sl].set(jnp.stack([x1, x2], axis=2).reshape(B, 2 * st, 3))
            v = v.at[:, st_sl].set(jnp.stack([v1, v2], axis=2).reshape(B, 2 * st, 3))

        if hi:
            xh = x[:, hi_sl].reshape(B, hi, 3, 3)
            vh = v[:, hi_sl].reshape(B, hi, 3, 3)
            fh = f[:, hi_sl].reshape(B, hi, 3, 3)
            hh = h[:, hi_sl].reshape(B, hi, 3, H)
            x0, v0 = xh[:, :, 0], vh[:, :, 0]

            # basis (f, x - x0, v - v0) with learned mixing (GMN.py:285-299)
            basis = jnp.stack([fh, xh - x0[:, :, None], vh - v0[:, :, None]], axis=-1)
            gram = jnp.einsum("bhnda,bhndc->bhnac", basis, basis).reshape(
                B, hi, 3, 9
            )
            msg = f_hinge(_normalize(gram))  # [B,hi,3,3]
            a0 = jnp.mean(jnp.einsum("bhnda,bhna->bhnd", basis, msg), axis=2)

            def apply_g(cx, cf):
                return jnp.cross(cx - x0, cf - a0) / jnp.sum(
                    (cx - x0) ** 2, -1, keepdims=True
                )

            beta1 = apply_g(xh[:, :, 1], fh[:, :, 1])
            beta2 = apply_g(xh[:, :, 2], fh[:, :, 2])

            def c_metrics(cx, cv):
                r = cx - x0
                rel = cv - v0
                rn = jnp.sqrt(jnp.sum(r * r, -1, keepdims=True))
                return r, jnp.cross(_normalize(r), rel) / jnp.clip(rn, 1e-5, None)

            r1, w1 = c_metrics(xh[:, :, 1], vh[:, :, 1])
            r2, w2 = c_metrics(xh[:, :, 2], vh[:, :, 2])
            h_c = center(hh[:, :, 1]) + center(hh[:, :, 2])
            v0 = gate_vel(h_c) * v0 + a0
            x0 = x0 + v0

            def upd(wv, bv, rv, hv):
                wv = gate_w(hv) * wv + bv
                th = jnp.sqrt(jnp.sum(wv * wv, -1) + 1e-30)
                rot = _rodrigues_batched(th, _normalize(wv))
                return jnp.einsum("bhij,bhj->bhi", rot, rv), wv

            r1, w1 = upd(w1, beta1, r1, hh[:, :, 1])
            r2, w2 = upd(w2, beta2, r2, hh[:, :, 2])
            x1, x2 = x0 + r1, x0 + r2
            v1 = v0 + jnp.cross(w1, r1)
            v2 = v0 + jnp.cross(w2, r2)
            x = x.at[:, hi_sl].set(jnp.stack([x0, x1, x2], axis=2).reshape(B, 3 * hi, 3))
            v = v.at[:, hi_sl].set(jnp.stack([v0, v1, v2], axis=2).reshape(B, 3 * hi, 3))

        # --- node update (GMN.py:158-170, others=h)
        agg = G.masked_segment_sum(edge_feat, mask)
        out = MLP([H], H, activation="silu")(jnp.concatenate([h, h, agg], axis=-1))
        h = h + out if self.recurrent else out
        return (h, x, v), None


class GMN(nn.Module):
    """``__call__(scene, mask) -> [B, N, 6]``."""

    hidden_features: int = 64
    num_layers: int = 4
    coords_weight: float = 1.0
    recurrent: bool = False
    norm_diff: bool = False
    tanh: bool = False
    n_isolated: int = 5
    n_stick: int = 0
    n_hinge: int = 0
    remat: bool = False  # jax.checkpoint each scanned layer in backprop:
    # O(1)-depth activation HBM at ~1/3 extra FLOPs, math unchanged

    @nn.compact
    def __call__(self, scene: Scene, mask, train: bool = False):
        charge = scene.charge if scene.charge is not None else scene.mass
        speed = jnp.linalg.norm(scene.vel, axis=-1, keepdims=True)
        h = TorchLinear(self.hidden_features)(
            jnp.concatenate([speed, charge], axis=-1)
        )
        qq = charge[:, :, None, :] * charge[:, None, :, :]  # edge attr q_i q_j

        scan = nn.scan(
            nn.remat(_GMNLayer) if self.remat else _GMNLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=self.num_layers,
        )(
            hidden=self.hidden_features,
            coords_weight=self.coords_weight,
            recurrent=self.recurrent,
            norm_diff=self.norm_diff,
            tanh=self.tanh,
            n_isolated=self.n_isolated,
            n_stick=self.n_stick,
            n_hinge=self.n_hinge,
            # pinned so remat=True/False share one param tree
            name="Scan_GMNLayer_0",
        )
        (h, x, v), _ = scan((h, scene.pos, scene.vel), qq, mask)
        return jnp.concatenate([x - scene.pos, v], axis=-1)

    def get_model_size(self) -> int:
        return self.hidden_features
