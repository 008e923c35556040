"""Attention-head pruning via parameter surgery.

The reference exposes ``PMGTAttention.prune_heads`` built on HF's
find_pruneable_heads_and_indices/prune_linear_layer
(modeling_pmgt.py:335-356): removing heads shrinks the q/k/v/ctx
projections' output dims and the attention-output projection's input dim.

In the functional JAX design the same operation is parameter surgery: it
returns a new parameter tree plus the config describing the pruned
architecture. Because the attention-output Dense consumes the concatenated
head outputs, slicing its kernel rows by the kept head slots preserves the
exact function of the remaining heads.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pmgt_tpu.core.config import PMGTConfig


def prune_attention_heads(
    params: Dict,
    config: PMGTConfig,
    heads_to_prune: Dict[int, Sequence[int]],
) -> Tuple[Dict, PMGTConfig]:
    """Remove attention heads from a PMGT parameter tree.

    Args:
        params: the model's "params" tree (with a ``bert`` subtree or the
            bert tree itself).
        config: current config.
        heads_to_prune: {layer_index: [head indices to remove]}. Every
            layer must keep the same number of heads (uniform hidden size);
            prune the same count per layer, as a pruned layer's width must
            match the residual stream.

    Returns:
        (new_params, new_config) with
        num_attention_heads -= heads_removed and hidden-size-preserving
        output projections. Only q/k/v/ctx kernels+biases and the
        attention-output kernel change.
    """
    if not heads_to_prune:
        return params, config

    counts = {len(set(v)) for v in heads_to_prune.values()}
    if len(counts) != 1 or set(heads_to_prune) != set(
        range(config.num_hidden_layers)
    ):
        raise ValueError(
            "prune the same number of heads in every layer (uniform "
            "attention width is required by the shared hidden size)"
        )
    n_removed = counts.pop()
    if n_removed >= config.num_attention_heads:
        raise ValueError("cannot prune all heads")

    d = config.head_dim
    new_heads = config.num_attention_heads - n_removed
    new_all = new_heads * d

    params = jax.tree.map(lambda x: x, params)  # copy structure
    bert = params["bert"] if "bert" in params else params

    for layer_idx, heads in heads_to_prune.items():
        keep = [
            h for h in range(config.num_attention_heads) if h not in set(heads)
        ]
        col_idx = np.concatenate([np.arange(h * d, (h + 1) * d) for h in keep])
        layer = dict(bert[f"layer_{layer_idx}"])
        attn = dict(layer["self_attention"])
        for name in ("query", "key", "value", "ctx_attention"):
            p = dict(attn[name])
            p["kernel"] = jnp.asarray(p["kernel"])[:, col_idx]
            p["bias"] = jnp.asarray(p["bias"])[col_idx]
            attn[name] = p
        layer["self_attention"] = attn
        out = dict(layer["attention_output"])
        out["kernel"] = jnp.asarray(out["kernel"])[col_idx, :]
        layer["attention_output"] = out
        bert[f"layer_{layer_idx}"] = layer

    new_config = dataclasses.replace(
        config, num_attention_heads=new_heads, head_dim_override=d
    )
    assert new_config.all_head_size == new_all
    return params, new_config
