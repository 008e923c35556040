"""Deep & Cross Network for CTR prediction.

Behavioral reference: pmgt/dcn/models.py:13-183.

Faithfulness notes:
- The reference's ``CrossLayer`` creates a bias parameter but never adds it
  in ``forward`` (dcn/models.py:60-69); we reproduce the *computation*
  (no bias) and expose ``use_cross_bias`` to enable the textbook DCN form.
- The rank-1 cross ``(x0 ⊗ x1) @ w`` is computed as ``x0 * (x1 @ w)`` —
  algebraically identical, O(B·H) instead of the reference's materialized
  O(B·H²) outer product. Better for both MXU and HBM.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _cross_weight_init(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) on a [H, 1] tensor: fan_in = 1,
    bound = sqrt(6 / ((1 + 5) * 1)) = 1 → U(-1, 1)
    (reference dcn/models.py:71-75)."""
    return jax.random.uniform(key, shape, dtype, minval=-1.0, maxval=1.0)


class CrossLayer(nn.Module):
    hidden_size: int
    dropout: float = 0.0
    use_layer_norm: bool = False
    layer_norm_eps: float = 1e-12
    use_cross_bias: bool = False

    @nn.compact
    def __call__(self, x0: Array, x1: Array, deterministic: bool = True) -> Array:
        w = self.param("weight", _cross_weight_init, (self.hidden_size, 1))
        out = x0 * (x1 @ w)  # rank-1 cross: (x0 x1ᵀ) w without the outer product
        if self.use_cross_bias:
            bias = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, minval=-1.0, maxval=1.0),
                (self.hidden_size,),
            )
            out = out + bias
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = out + x0
        if self.use_layer_norm:
            out = nn.LayerNorm(epsilon=self.layer_norm_eps)(out)
        return out


class CrossNet(nn.Module):
    input_size: int
    num_layers: int
    dropout: float = 0.0
    use_layer_norm: bool = False
    layer_norm_eps: float = 1e-12
    use_cross_bias: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x0, x1 = x, x
        for i in range(self.num_layers):
            x1 = CrossLayer(
                self.input_size,
                self.dropout,
                self.use_layer_norm,
                self.layer_norm_eps,
                self.use_cross_bias,
                name=f"cross_{i}",
            )(x0, x1, deterministic)
        return x1


class DeepNet(nn.Module):
    linear_sizes: Sequence[int]
    dropout: float = 0.0
    use_layer_norm: bool = False
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        for i, size in enumerate(self.linear_sizes):
            x = nn.Dense(size, name=f"deep_{i}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            if self.use_layer_norm:
                x = nn.LayerNorm(epsilon=self.layer_norm_eps, name=f"deep_norm_{i}")(x)
            x = nn.relu(x)
        return x


class DCN(nn.Module):
    """DCN over (user, item) id pairs (reference dcn/models.py:125-183):
    embedding concat → parallel CrossNet + DeepNet → concat → linear."""

    user_num: int
    item_num: int
    factor_num: int = 32
    deep_net_num_layers: int = 3
    cross_net_num_layers: int = 2
    emb_dropout: float = 0.0
    dropout: float = 0.0
    use_layer_norm: bool = False
    layer_norm_eps: float = 1e-12
    use_cross_bias: bool = False

    def setup(self):
        input_size = self.factor_num * (2 ** self.deep_net_num_layers)
        # torch nn.Embedding default init is N(0, 1) (reference relies on it).
        emb_init = nn.initializers.normal(stddev=1.0)
        self.user_embeddings = nn.Embed(
            self.user_num, input_size, embedding_init=emb_init
        )
        self.item_embeddings = nn.Embed(
            self.item_num, input_size, embedding_init=emb_init
        )
        # Halving widths: fn * 2^(L+1-i), i = 1..L (reference dcn/models.py:148-151).
        linear_sizes = [
            self.factor_num * (2 ** (self.deep_net_num_layers + 1 - i))
            for i in range(1, self.deep_net_num_layers + 1)
        ]
        self.deep_net = DeepNet(
            linear_sizes, self.dropout, self.use_layer_norm, self.layer_norm_eps
        )
        self.cross_net = CrossNet(
            input_size * 2,
            self.cross_net_num_layers,
            self.dropout,
            self.use_layer_norm,
            self.layer_norm_eps,
            self.use_cross_bias,
        )
        self.output_layer = nn.Dense(1)
        self.emb_drop = nn.Dropout(self.emb_dropout)

    def __call__(
        self, user: Array, item: Array, deterministic: bool = True
    ) -> Array:
        interaction = jnp.concatenate(
            [self.user_embeddings(user), self.item_embeddings(item)], axis=-1
        )
        interaction = self.emb_drop(interaction, deterministic=deterministic)
        cross = self.cross_net(interaction, deterministic)
        deep = self.deep_net(interaction, deterministic)
        out = self.output_layer(jnp.concatenate([cross, deep], axis=-1))
        return out[..., 0]
