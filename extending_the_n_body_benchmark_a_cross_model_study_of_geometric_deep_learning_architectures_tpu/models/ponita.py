"""PONITA: position-orientation fiber-bundle network — dense TPU build.

Re-design of ``models/ponita/`` (PonitaFiberBundle + PONITA_NBODY wrapper).
Feature state lives on a shared S2 orientation grid: ``x [B, N, O, C]``.
The three einsum stages per layer (spatial depthwise conv over neighbours,
fiber conv over orientations, ConvNeXt channel MLP) are exactly the
reference's ``FiberBundleConv`` + ``ConvNext`` (``models/ponita/nn/conv.py:
65-140``, ``nn/convnext.py:4-33``) in dense ``[B, N, N, O, ...]`` form.

Pieces and their reference sources:
* lift: mass scalar repeated over the grid + velocity projected per
  orientation (``transforms/position_orientation_graph.py:58-87``,
  ``utils/to_from_sphere.py:4-8``)
* rotation-invariant attrs inv1/inv2 (spatial) + inv3 (orientation pair)
  (``geometry/invariants.py:9-51``)
* polynomial-feature kernel basis + polynomial window
  (``models/ponita_pg.py:91-106``, ``nn/embedding.py:4-16``,
  ``utils/windowing.py:4-31``)
* multiple readouts averaged, sphere -> vec via
  ``einsum(signal, ori)/O`` (``ponita_pg.py:149-174``,
  ``to_from_sphere.py:10-11``)
* one-time std re-calibration of the conv kernels
  (``nn/conv.py:115-140``) — reproduced functionally: stats are sown in the
  forward pass and :func:`calibrate_params` rescales the kernel weights once
  before training (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core import graph as G
from ..core.scene import Scene
from ..ops.s2grid import uniform_grid_s2
from .common import TorchLinear, torch_kernel_init


def polynomial_features(x: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Tensor-power features (``nn/embedding.py:4-16``): concat of
    x, x(x)x, ..., x^(d) flattened."""
    feats = [x]
    for _ in range(1, degree):
        feats.append(
            (feats[-1][..., :, None] * x[..., None, :]).reshape(
                x.shape[:-1] + (feats[-1].shape[-1] * x.shape[-1],)
            )
        )
    return jnp.concatenate(feats, axis=-1)


class _BasisNet(nn.Module):
    """PolynomialFeatures -> Linear -> GELU -> Linear -> GELU
    (``ponita_pg.py:92-105``)."""

    hidden_dim: int
    basis_dim: int
    degree: int = 3

    @nn.compact
    def __call__(self, attr):
        h = polynomial_features(attr, self.degree)
        h = nn.gelu(TorchLinear(self.hidden_dim)(h), approximate=False)
        return nn.gelu(TorchLinear(self.basis_dim)(h), approximate=False)


class _FiberBundleConv(nn.Module):
    """Separable depthwise R3xS2 conv (``nn/conv.py:65-140``)."""

    channels: int
    basis_dim: int

    @nn.compact
    def __call__(self, x, kernel_basis, fiber_kernel_basis, adj):
        """x [B,N,O,C]; kernel_basis [B,N,N,O,basis] (receiver, sender);
        fiber_kernel_basis [O,O,basis]; adj [B,N,N]."""
        num_ori = x.shape[-2]
        # torch nn.Linear init (U(±1/sqrt(fan_in)), matching the reference
        # conv's kernel nets, ``nn/conv.py:84-85``); plain nn.Dense keeps the
        # param-tree layout stable for existing checkpoints + calibrate_params
        kernel = nn.Dense(
            self.channels, use_bias=False, kernel_init=torch_kernel_init,
            dtype=x.dtype, param_dtype=jnp.float32,
        )(kernel_basis)  # [B,N,N,O,C]
        self.sow("calib", "std_in", jnp.std(x))
        # spatial conv: message = kernel * x_sender, aggregated over senders
        msgs = kernel * x[:, None, :, :, :]
        x1 = G.masked_segment_sum(msgs, adj)  # [B,N,O,C]
        self.sow("calib", "std_1", jnp.std(x1))
        fiber_kernel = nn.Dense(
            self.channels, use_bias=False, kernel_init=torch_kernel_init,
            dtype=x.dtype, param_dtype=jnp.float32,
        )(fiber_kernel_basis)  # [O,P,C]
        x2 = jnp.einsum("bnoc,opc->bnpc", x1, fiber_kernel) / num_ori
        self.sow("calib", "std_2", jnp.std(x2))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return x2 + bias.astype(x.dtype)


class _ConvNextBlock(nn.Module):
    """ConvNeXt wrapper (``nn/convnext.py:4-33``)."""

    channels: int
    basis_dim: int
    widening_factor: int = 4
    layer_scale: Optional[float] = 1e-6

    @nn.compact
    def __call__(self, x, kernel_basis, fiber_kernel_basis, adj):
        inp = x
        x = _FiberBundleConv(self.channels, self.basis_dim)(
            x, kernel_basis, fiber_kernel_basis, adj
        )
        x = nn.LayerNorm(dtype=x.dtype)(x)
        x = TorchLinear(self.widening_factor * self.channels)(x)
        x = nn.gelu(x, approximate=False)
        x = TorchLinear(self.channels)(x)
        if self.layer_scale is not None:
            scale = self.param(
                "layer_scale",
                lambda key, shape: jnp.full(shape, self.layer_scale, jnp.float32),
                (self.channels,),
            )
            x = scale.astype(x.dtype) * x
        if inp.shape == x.shape:
            x = x + inp
        return x


class PONITA(nn.Module):
    """``__call__(scene, mask) -> [B, N, 6]`` (pos_dt ‖ vel).

    Inputs per the ponita dataloader (``dataloaders/ponita_n_body_dataloader
    .py:8-38``): scalar = mass, vector = velocity.
    """

    hidden_features: int = 128
    num_layers: int = 8
    num_ori: int = 20
    basis_dim: int = 128
    degree: int = 3
    widening_factor: int = 4
    layer_scale: Optional[float] = 1e-6
    radius: Optional[float] = None
    multiple_readouts: bool = True
    out_channels_vec: int = 2

    @nn.compact
    def __call__(self, scene: Scene, mask, train: bool = False):
        H, O = self.hidden_features, self.num_ori
        ori = jnp.asarray(uniform_grid_s2(O), scene.pos.dtype)  # [O,3]

        # receiver r / sender s: adj[b,r,s] = mask[b,s,r];
        # rel_pos = pos_send - pos_receive (infer_self_feed.py:141-145)
        adj = jnp.swapaxes(mask, 1, 2)
        rel = -G.rel_positions(scene.pos)  # [b,r,s] = pos_s - pos_r

        # invariants (geometry/invariants.py:9-51)
        rel_e = rel[..., None, :]  # [B,N,N,1,3]
        inv1 = jnp.sum(rel_e * ori, axis=-1, keepdims=True)  # [B,N,N,O,1]
        perp = rel_e - inv1 * ori
        inv2 = G.safe_sqrt(jnp.sum(perp * perp, axis=-1, keepdims=True))
        attr = jnp.concatenate([inv1, inv2], axis=-1)  # [B,N,N,O,2]
        inv3 = jnp.sum(ori[:, None, :] * ori[None, :, :], axis=-1, keepdims=True)

        kernel_basis = _BasisNet(H, self.basis_dim, self.degree)(attr)
        if self.radius is not None:
            dists = G.safe_sqrt(jnp.sum(rel * rel, axis=-1, keepdims=True))
            window = G.polynomial_cutoff(dists, self.radius)
            kernel_basis = kernel_basis * window[..., None, :]
        fiber_kernel_basis = _BasisNet(H, self.basis_dim, self.degree)(inv3)

        # lift inputs to the sphere (position_orientation_graph.py:76-87)
        scalar_sphere = jnp.broadcast_to(
            scene.mass[:, :, None, :], scene.mass.shape[:2] + (O, scene.mass.shape[-1])
        )
        vec_sphere = jnp.einsum("bnd,od->bno", scene.vel, ori)[..., None]
        x = jnp.concatenate([scalar_sphere, vec_sphere], axis=-1)  # [B,N,O,2]
        # x_embedder is a bias-free torch nn.Linear (``ponita_pg.py:109``) —
        # torch init via kernel_init, keeping the Dense_0 param slot
        x = nn.Dense(
            H, use_bias=False, kernel_init=torch_kernel_init,
            dtype=x.dtype, param_dtype=jnp.float32,
        )(x)

        # layer_scale == 0.0 disables layer scale, like the reference's
        # config surface (``ponita_nbody.py:54-55`` maps 0.0 -> None; plain
        # None can't round-trip a config, it reads as "unset")
        layer_scale = self.layer_scale if self.layer_scale else None
        readouts = []
        for i in range(self.num_layers):
            x = _ConvNextBlock(
                H, self.basis_dim, self.widening_factor, layer_scale
            )(x, kernel_basis, fiber_kernel_basis, adj)
            if self.multiple_readouts or i == self.num_layers - 1:
                readouts.append(TorchLinear(self.out_channels_vec)(x))
        readout = sum(readouts) / len(readouts)  # [B,N,O,2]

        # sphere -> vec (to_from_sphere.py:10-11), flatten (ponita_nbody.py:92)
        vecs = jnp.einsum("bnoc,od->bncd", readout, ori) / O  # [B,N,2,3]
        return vecs.reshape(vecs.shape[:2] + (3 * self.out_channels_vec,))

    def get_model_size(self) -> int:
        return self.hidden_features


def calibrate_params(model, params, scene: Scene, mask):
    """One-time kernel std re-calibration (``nn/conv.py:115-140``).

    Runs a forward pass collecting per-conv (std_in, std_1, std_2) and
    rescales: spatial kernel *= std_in/std_1, fiber kernel *= std_1/std_2.
    Returns updated params (a pure function of the sample batch, equivalent
    to the reference's first-training-step mutation).
    """
    import flax

    _, state = model.apply(params, scene, mask, mutable=["calib"])
    calib = flax.traverse_util.flatten_dict(state["calib"])
    flat = flax.traverse_util.flatten_dict(params["params"])
    # calib keys look like (..., '_FiberBundleConv_0', 'std_in')
    by_conv = {}
    for path, val in calib.items():
        by_conv.setdefault(path[:-1], {})[path[-1]] = val[0]
    for conv_path, stats in by_conv.items():
        std_in, std_1, std_2 = (
            float(stats["std_in"]),
            float(stats["std_1"]),
            float(stats["std_2"]),
        )
        spatial_key = conv_path + ("Dense_0", "kernel")
        fiber_key = conv_path + ("Dense_1", "kernel")
        if std_1 > 0:
            flat[spatial_key] = flat[spatial_key] * (std_in / std_1)
        if std_2 > 0:
            flat[fiber_key] = flat[fiber_key] * (std_1 / std_2)
    new_params = dict(params)
    new_params["params"] = flax.traverse_util.unflatten_dict(flat)
    return flax.core.freeze(new_params) if isinstance(params, flax.core.FrozenDict) else new_params
