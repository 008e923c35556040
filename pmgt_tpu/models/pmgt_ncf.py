"""PMGT_NCF: NCF whose item tower is a full PMGT encoder over sampled
neighborhoods.

Behavioral reference: pmgt/pmgt_ncf/models.py:15-105. The reference
implements this variant but never wires a trainer for it (no
pmgt_ncf/trainer.py; train.py:306 only dispatches ncf/pmgt/dcn) — here it
is a first-class workload (tasks/pmgt_ncf_task.py).

Frozen multimodal tables are inputs (like PMGTForPreTraining); the CLS
state of the encoded item neighborhood is the MLP tower's item embedding
(reference pmgt_ncf/models.py:86-89); NeuMF-end adds a GMF branch indexed
by the raw item id (the reference derives it as node id - 2,
pmgt_ncf/models.py:97; we pass it explicitly so graph-absent items and
divergent item/node encoders stay correct).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pmgt_tpu.core.config import PMGTConfig
from pmgt_tpu.models.pmgt import PMGTModel, lookup_rows

Array = jax.Array


class PMGT_NCF(nn.Module):
    user_num: int
    item_num: int
    config: PMGTConfig
    factor_num: int = 32
    num_layers: int = 3
    emb_dropout: float = 0.0
    dropout: float = 0.0
    model: str = "MLP"  # {"MLP", "NeuMF-end"}

    def setup(self):
        assert self.model in ("MLP", "NeuMF-end"), self.model
        fn, nl = self.factor_num, self.num_layers
        emb_init = nn.initializers.normal(stddev=0.01)

        self.bert = PMGTModel(self.config, name="bert")
        self.mlp_user_embeddings = nn.Embed(
            self.user_num, fn * (2 ** (nl - 1)), embedding_init=emb_init
        )
        # Tower widths fn * 2^(nl-i) -> half (reference
        # pmgt_ncf/models.py:55-76); its input is
        # [user fn*2^(nl-1) ; item hidden_size].
        self.mlp_layers = [
            nn.Dense(
                (fn * (2 ** (nl - i))) // 2,
                kernel_init=nn.initializers.xavier_uniform(),
                name=f"mlp_{i}",
            )
            for i in range(nl)
        ]
        if self.model == "NeuMF-end":
            self.gmf_user_embeddings = nn.Embed(
                self.user_num, fn, embedding_init=emb_init
            )
            self.gmf_item_embeddings = nn.Embed(
                self.item_num, fn, embedding_init=emb_init
            )
        self.predict_layer = nn.Dense(1, name="predict_layer")
        self.emb_drop = nn.Dropout(self.emb_dropout)
        self.hidden_drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        feat_tables: Sequence[Array],
        user: Array,  # [B]
        item_node_ids: Array,  # [B, S] neighborhood sequences
        item_attention_mask: Array,  # [B, S]
        item: Array = None,  # [B] raw item ids (GMF branch, NeuMF-end only)
        deterministic: bool = True,
    ) -> Array:
        if self.config.fusion_strategy == "gather_rows":
            feat_embeds = lookup_rows(
                feat_tables, item_node_ids, jnp.dtype(self.config.dtype)
            )
            hidden, _ = self.bert(
                feat_embeds, item_attention_mask, deterministic,
                projected=False,
            )
        else:
            proj_tables = self.bert.project_tables(feat_tables)
            feat_embeds = [t[item_node_ids] for t in proj_tables]
            hidden, _ = self.bert(
                feat_embeds, item_attention_mask, deterministic,
                projected=True,
            )
        item_embeds = hidden[:, 0]  # CLS

        x = jnp.concatenate(
            [self.mlp_user_embeddings(user), item_embeds], axis=-1
        )
        x = self.emb_drop(x, deterministic=deterministic)
        for layer in self.mlp_layers:
            x = layer(x)
            x = self.hidden_drop(x, deterministic=deterministic)
            x = nn.relu(x)

        if self.model == "NeuMF-end":
            # GMF indexes the *raw item id* (reference pmgt_ncf/models.py:97
            # relies on the node-id = item-id + 2 convention; we take the
            # item id directly so graph-absent items — node id 0, which
            # `- 2` would wrap to item_num-2's embedding — and divergent
            # item/node encoders both gather the right row).
            item_idx = (
                item if item is not None else item_node_ids[:, 0] - 2
            )
            item_idx = jnp.clip(item_idx, 0, self.item_num - 1)
            gmf = self.gmf_user_embeddings(user) * self.gmf_item_embeddings(
                item_idx
            )
            gmf = self.emb_drop(gmf, deterministic=deterministic)
            x = jnp.concatenate([gmf, x], axis=-1)

        return self.predict_layer(x)[..., 0]
