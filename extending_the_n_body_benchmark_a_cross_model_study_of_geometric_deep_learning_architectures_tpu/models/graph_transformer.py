"""Graph Transformer baseline: full-attention set transformer per simulation.

Re-design of ``models/graph_transformer/graph_transformer_torch.py`` +
``models/set_transformer/models.py``.  The reference densifies the PyG batch
with ``to_dense_batch`` and runs ``nn.TransformerEncoder``; here data is
already dense ``[B, N, F]`` so the model is a straight post-LN transformer
encoder (torch ``TransformerEncoderLayer`` semantics: MHA -> add -> LN ->
FFN(2048, relu) -> add -> LN, dropout 0.1) followed by the reference's output
MLP (``set_transformer/models.py:46-60``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..core.scene import Scene
from .common import MLP, TorchLinear


class _EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer matching torch defaults
    (``nn.TransformerEncoderLayer``: dim_feedforward=2048, dropout=0.1,
    activation=relu, norm_first=False)."""

    model_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.model_dim,
            out_features=self.model_dim,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=x.dtype,
        )(x, x)
        attn = nn.Dropout(rate=self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(dtype=x.dtype)(x + attn)

        ff = TorchLinear(self.dim_feedforward)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(rate=self.dropout, deterministic=not train)(ff)
        ff = TorchLinear(self.model_dim)(ff)
        ff = nn.Dropout(rate=self.dropout, deterministic=not train)(ff)
        return nn.LayerNorm(dtype=x.dtype)(x + ff)


class GraphTransformer(nn.Module):
    """``__call__(scene, mask) -> [B, N, 6]``.

    Input features mirror ``GraphTransformerTorch._gather_features``
    (``graph_transformer_torch.py:49-63``): concat of the per-target source
    fields — pos for pos_dt, vel for vel.  The neighbour mask is unused
    (full attention), kept for the uniform model interface.
    """

    hidden_features: int = 96
    num_layers: int = 4
    num_heads: int = 4
    num_targets: int = 2
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, scene: Scene, mask=None, train: bool = False):
        x = jnp.concatenate([scene.pos, scene.vel], axis=-1)  # [B,N,6]
        out_dim = 3 * self.num_targets

        h = TorchLinear(self.hidden_features)(x)
        for _ in range(self.num_layers):
            h = _EncoderLayer(
                model_dim=self.hidden_features,
                num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
            )(h, train=train)
        # Output MLP head (mlp_type='output', hidden_dims=[H, H], ReLU).
        return MLP(
            hidden=[self.hidden_features, self.hidden_features],
            out=out_dim,
            activation="relu",
        )(h)

    def get_model_size(self) -> int:
        return self.hidden_features
