"""Shared model building blocks (flax.linen, dense ``[B, N, ...]`` layout).

Initialisation note: torch ``nn.Linear`` defaults to
``U(-1/sqrt(fan_in), +1/sqrt(fan_in))`` for both kernel and bias.  The
reference models rely on that scale interacting with the Noam LR schedule
(``trainer.py:189-195``), so :func:`torch_linear` reproduces it; layers where
the reference uses a special init (e.g. the tiny-gain coord head of EGNN,
``models/egnn_mc/egnn_mc.py:94``) override explicitly.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_gain(gain: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        bound = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """``nn.Dense`` with torch-Linear default initialisation."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_kernel_init,
            bias_init=self.bias_init or torch_bias_init_for(fan_in),
            dtype=x.dtype,
            param_dtype=jnp.float32,
        )(x)


ACTIVATIONS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
    "lrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
}


def get_activation(name: str) -> Callable:
    name = name.lower()
    if name not in ACTIVATIONS:
        raise ValueError(f"Unsupported activation '{name}'.")
    return ACTIVATIONS[name]


class MLP(nn.Module):
    """Plain MLP: Linear -> act -> ... -> Linear [-> act].

    ``hidden`` lists the hidden widths; ``out`` the output width.  With
    ``final_act=True`` an activation follows the last layer too (the
    reference's edge MLPs end in an activation, ``egnn_mc.py:76-81``).
    """

    hidden: Sequence[int]
    out: int
    activation: str = "silu"
    final_act: bool = False
    final_bias: bool = True
    final_kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        for h in self.hidden:
            x = TorchLinear(h)(x)
            x = act(x)
        x = TorchLinear(
            self.out, use_bias=self.final_bias, kernel_init=self.final_kernel_init
        )(x)
        if self.final_act:
            x = act(x)
        return x
