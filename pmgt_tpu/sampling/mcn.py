"""MCNSampling: contextual-neighborhood sampling, vectorized for TPU.

The reference samples per node in Python/networkx inside DataLoader workers
(reference pmgt/pmgt/datasets.py:14-53): hop-wise weighted sampling with
replacement (per-node softmax over edge weights), frequency scoring
``score[node] += freq * (depth - k + 1)``, then the top ``max_ctx_neigh``
nodes by score become the context.

This implementation reproduces the same *distribution* as one jitted,
fully-batched function of a PRNG key:

- hop-wise draws are `jax.random.categorical` over padded neighbor-weight
  logits (categorical applies softmax internally, matching the reference's
  ``softmax(weights)`` probabilities, datasets.py:27-32);
- frequency scoring is a dense scatter-add over a [B, N_total] buffer;
- the context is `jax.lax.top_k` over scores (ties broken by node id
  instead of the reference's dict insertion order — a distributional
  equivalence, not a bit-exact RNG match).

All shapes are static: [B] targets → [B, 1+K] context sequences.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pmgt_tpu.core.config import SamplingConfig
from pmgt_tpu.graph.container import NUM_SPECIAL_NODES, PaddedGraph


def sample_context(
    graph: PaddedGraph,
    targets: jnp.ndarray,
    key: jax.Array,
    cfg: SamplingConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample contextual neighborhoods for a batch of target nodes.

    Args:
        graph: PaddedGraph with jnp (device) arrays.
        targets: [B] int32 node ids (id space: real nodes are >= 2).
        key: PRNG key.
        cfg: sampling configuration.

    Returns:
        node_ids: [B, 1 + max_ctx_neigh] int32 — target followed by context
            nodes ordered by descending score, 0-padded.
        attention_mask: [B, 1 + max_ctx_neigh] float32 — 1 for target and
            real context nodes, 0 for padding.
    """
    nbr_ids = jnp.asarray(graph.nbr_ids)
    nbr_logits = jnp.asarray(graph.nbr_logits)
    n_total = nbr_ids.shape[0]
    batch = targets.shape[0]
    depth = len(cfg.hop_sampling_sizes)

    scores = jnp.zeros((batch, n_total), dtype=jnp.float32)
    frontier = targets[:, None]  # [B, 1]

    hop_keys = jax.random.split(key, depth)
    for k, sample_size in enumerate(cfg.hop_sampling_sizes):
        # Gather neighbor tables for the current frontier: [B, F, D].
        f_logits = nbr_logits[frontier]
        f_ids = nbr_ids[frontier]
        # sample_size draws per frontier node, with replacement.
        draws = jax.random.categorical(
            hop_keys[k],
            f_logits,
            axis=-1,
            shape=(sample_size,) + frontier.shape,
        )  # [s, B, F]
        draws = jnp.moveaxis(draws, 0, -1)  # [B, F, s]
        sampled = jnp.take_along_axis(f_ids, draws, axis=-1)  # [B, F, s]
        sampled = sampled.reshape(batch, -1)  # [B, F*s]

        # score += freq * (depth - k); k is 0-based here, the reference's is
        # 1-based with weight (depth - k + 1) — identical values.
        hop_weight = jnp.float32(depth - k)
        scores = _scatter_add_rows(scores, sampled, hop_weight)

        frontier = sampled

    # Exclude special ids (<pad>, <mask>) and the target itself
    # (reference datasets.py:38-39).
    special = jnp.zeros((batch, NUM_SPECIAL_NODES), dtype=scores.dtype)
    scores = jax.lax.dynamic_update_slice(scores, special, (0, 0))
    scores = _scatter_set_rows(scores, targets[:, None], 0.0)

    top_vals, top_ids = jax.lax.top_k(scores, cfg.max_ctx_neigh)
    valid = top_vals > 0.0
    ctx_ids = jnp.where(valid, top_ids, 0).astype(jnp.int32)

    node_ids = jnp.concatenate([targets[:, None].astype(jnp.int32), ctx_ids], axis=1)
    attention_mask = jnp.concatenate(
        [jnp.ones((batch, 1), jnp.float32), valid.astype(jnp.float32)], axis=1
    )
    return node_ids, attention_mask


def _scatter_add_rows(
    buf: jnp.ndarray, col_ids: jnp.ndarray, value
) -> jnp.ndarray:
    """buf[b, col_ids[b, j]] += value for all b, j (duplicates accumulate)."""
    batch, n = buf.shape
    rows = jnp.broadcast_to(
        jnp.arange(batch, dtype=col_ids.dtype)[:, None], col_ids.shape
    )
    flat = buf.reshape(-1)
    idx = (rows * n + col_ids).reshape(-1)
    flat = flat.at[idx].add(value, mode="drop")
    return flat.reshape(batch, n)


def _scatter_set_rows(
    buf: jnp.ndarray, col_ids: jnp.ndarray, value
) -> jnp.ndarray:
    """buf[b, col_ids[b, j]] = value for all b, j."""
    batch, n = buf.shape
    rows = jnp.broadcast_to(
        jnp.arange(batch, dtype=col_ids.dtype)[:, None], col_ids.shape
    )
    flat = buf.reshape(-1)
    idx = (rows * n + col_ids).reshape(-1)
    flat = flat.at[idx].set(value, mode="drop")
    return flat.reshape(batch, n)
