"""Neural Collaborative Filtering (GMF / MLP / NeuMF-end / NeuMF-pre).

Behavioral reference: pmgt/ncf/models.py:14-154. The four variants share
one module; ``model`` selects the active towers. NeuMF-pre is realized by
``fuse_neumf_params`` which blends trained GMF and MLP parameter trees the
same way the reference fuses checkpoints (ncf/models.py:88-126).

TPU notes: both towers are embedding gathers + small dense layers — the
win on TPU comes from scoring users against their full candidate list in
one batched forward (tasks/ncf_task.py eval loop) instead of the reference's
per-user Python loop (ncf/trainer.py:202-219).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

_VARIANTS = ("MLP", "GMF", "NeuMF-end", "NeuMF-pre")


def _kaiming_uniform_sigmoid(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=1, nonlinearity='sigmoid') on a [in, out]
    kernel: gain=1, bound = sqrt(3 / fan_in) (reference ncf/models.py:128)."""
    fan_in = shape[0]
    bound = math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class NCF(nn.Module):
    user_num: int
    item_num: int
    factor_num: int = 32
    num_layers: int = 3
    emb_dropout: float = 0.0
    dropout: float = 0.0
    use_layer_norm: bool = False
    layer_norm_eps: float = 1e-12
    model: str = "NeuMF-end"

    def setup(self):
        assert self.model in _VARIANTS, self.model
        fn, nl = self.factor_num, self.num_layers
        mlp_dim = fn * (2 ** (nl - 1))
        emb_init = nn.initializers.normal(stddev=0.01)

        if self.model != "MLP":
            self.embed_user_GMF = nn.Embed(self.user_num, fn, embedding_init=emb_init)
            self.embed_item_GMF = nn.Embed(self.item_num, fn, embedding_init=emb_init)
        if self.model != "GMF":
            self.embed_user_MLP = nn.Embed(
                self.user_num, mlp_dim, embedding_init=emb_init
            )
            self.embed_item_MLP = nn.Embed(
                self.item_num, mlp_dim, embedding_init=emb_init
            )
            # Halving-width tower: fn * 2^(nl - i) -> half, i = 0..nl-1
            # (reference ncf/models.py:64-72).
            layers = []
            norms = []
            for i in range(nl):
                in_size = fn * (2 ** (nl - i))
                layers.append(
                    nn.Dense(
                        in_size // 2,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"mlp_{i}",
                    )
                )
                if self.use_layer_norm:
                    norms.append(
                        nn.LayerNorm(epsilon=self.layer_norm_eps, name=f"mlp_norm_{i}")
                    )
            self.mlp_layers = layers
            self.mlp_norms = norms if self.use_layer_norm else None

        # predict width (fn, or fn*2 for NeuMF) is inferred from the
        # concat input by nn.Dense
        self.predict_layer = nn.Dense(
            1, kernel_init=_kaiming_uniform_sigmoid, name="predict_layer"
        )

        self.emb_drop = nn.Dropout(self.emb_dropout)
        self.hidden_drop = nn.Dropout(self.dropout)

    def __call__(
        self, user: Array, item: Array, deterministic: bool = True
    ) -> Array:
        """Score (user, item) pairs → [B] logits."""
        outputs = []
        if self.model != "MLP":
            gmf = self.embed_user_GMF(user) * self.embed_item_GMF(item)
            gmf = self.emb_drop(gmf, deterministic=deterministic)
            outputs.append(gmf)
        if self.model != "GMF":
            x = jnp.concatenate(
                [self.embed_user_MLP(user), self.embed_item_MLP(item)], axis=-1
            )
            x = self.emb_drop(x, deterministic=deterministic)
            for i, layer in enumerate(self.mlp_layers):
                x = layer(x)
                x = self.hidden_drop(x, deterministic=deterministic)
                if self.mlp_norms is not None:
                    x = self.mlp_norms[i](x)
                x = nn.relu(x)
            outputs.append(x)

        if self.model == "GMF":
            concat = outputs[0]
        elif self.model == "MLP":
            concat = outputs[0]
        else:
            concat = jnp.concatenate(outputs, axis=-1)
        return self.predict_layer(concat)[..., 0]


def fuse_neumf_params(
    neumf_params: Dict[str, Any],
    gmf_params: Dict[str, Any],
    mlp_params: Dict[str, Any],
    alpha: float = 0.5,
) -> Dict[str, Any]:
    """Build NeuMF-pre parameters from trained GMF and MLP parameter trees
    (reference ncf/models.py:88-126): copy the tower weights, and set the
    predict layer to [alpha * W_gmf ; (1 - alpha) * W_mlp] with the blended
    bias."""
    params = jax.tree.map(lambda x: x, neumf_params)  # shallow copy

    params["embed_user_GMF"] = jax.tree.map(
        jnp.asarray, gmf_params["embed_user_GMF"]
    )
    params["embed_item_GMF"] = jax.tree.map(
        jnp.asarray, gmf_params["embed_item_GMF"]
    )
    params["embed_user_MLP"] = jax.tree.map(
        jnp.asarray, mlp_params["embed_user_MLP"]
    )
    params["embed_item_MLP"] = jax.tree.map(
        jnp.asarray, mlp_params["embed_item_MLP"]
    )
    for name in list(params.keys()):
        # Dense tower layers only ("mlp_{i}"): the reference's fusion
        # isinstance-checks nn.Linear (ncf/models.py:100-103), so the
        # use_layer_norm towers' LayerNorms ("mlp_norm_{i}") stay at
        # NeuMF-pre's FRESH init — copying them too deviated from the
        # published fusion whenever layer norm was tuned on.
        if (
            name.startswith("mlp_")
            and not name.startswith("mlp_norm_")
            and name in mlp_params
        ):
            params[name] = jax.tree.map(jnp.asarray, mlp_params[name])

    w_gmf = gmf_params["predict_layer"]["kernel"]  # [fn, 1]
    w_mlp = mlp_params["predict_layer"]["kernel"]  # [fn, 1]
    params["predict_layer"] = {
        "kernel": jnp.concatenate([alpha * w_gmf, (1 - alpha) * w_mlp], axis=0),
        "bias": alpha * gmf_params["predict_layer"]["bias"]
        + (1 - alpha) * mlp_params["predict_layer"]["bias"],
    }
    return params


def inject_item_embeddings(
    params: Dict[str, Any],
    item_init_emb,
    target: str = "embed_item_MLP",
) -> Dict[str, Any]:
    """Inject PMGT-pretrained item embeddings into an embedding table
    (reference ncf/trainer.py:168-180 / dcn/trainer.py:127-139)."""
    params = dict(params)
    table = params[target]["embedding"]
    emb = jnp.asarray(item_init_emb, dtype=table.dtype)
    if emb.shape != table.shape:
        raise ValueError(
            f"item embedding shape {emb.shape} != table shape {table.shape}"
        )
    params[target] = {"embedding": emb}
    return params
