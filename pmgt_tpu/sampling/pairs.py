"""Positive/negative pair sampling and pretraining batch assembly.

Reference semantics (pmgt/pmgt/datasets.py:113-183):
- positives: ``min(max_total_samples - min_neg_samples, degree)`` direct
  neighbors sampled uniformly *without* replacement (datasets.py:167-171);
- negatives: rejection-sampled uniform non-neighbors in [2, N+2)
  (datasets.py:173-180); in training the total pair count is always exactly
  ``max_total_samples`` (= num_pos + max(min_neg, total - num_pos));
- evaluation uses 1 positive + 1 negative per target (datasets.py:125-127).

TPU-native differences:
- Everything is fixed-shape: pairs live in a dense [B, P] tensor with a
  validity mask instead of the reference's ragged ``num_pairs`` flattening
  (datasets.py:186-208).
- Without-replacement positive sampling uses random-key top-k over the
  padded neighbor list; negatives are exact uniform draws over the
  non-neighbor set via order-statistics rank selection
  (``complement_rank_select``) — the distribution the reference's
  unbounded rejection ``while`` converges to, with guaranteed
  termination under static shapes.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pmgt_tpu.core.config import SamplingConfig
from pmgt_tpu.graph.container import NUM_SPECIAL_NODES, PaddedGraph
from pmgt_tpu.sampling.mcn import complement_rank_select, sample_context

# Node-chunk threshold for whole-graph refresh programs: above it the
# refresh lax.maps over node chunks to bound the wavefront row-gather
# intermediate ([chunk * prod(hops[:-1]), draw_row_lanes] in _alias_draw)
# that OOMs HBM when drawn for every node at once (measured 20.5 GB at
# 1M nodes). Graphs at or below the threshold keep the single-shot path
# (bit-identical streams for every existing test/bench graph).
REFRESH_CHUNK = 65_536

def effective_refresh_chunk(
    graph: PaddedGraph, cfg: SamplingConfig, free_bytes: Optional[int] = None
) -> int:
    """The node-chunk size the chunked whole-graph refresh should use.

    Chunk LATENCY dominates the chunked refresh — halving the chunk at
    100k nodes measured ~1.9x slower (381 vs 202 ms/refresh, interleaved
    A/B, top-k impl pinned on both sides), so the full REFRESH_CHUNK is
    kept unless memory pressure forces smaller. The hop gather output
    and its lane-major relayout copy each transiently materialize
    ``chunk * prod(hops[:-1]) * draw_row_lanes * 4`` bytes — ~3.4 GB
    apiece at 65,536-node chunks and ~34 max_deg. Fine when the
    persistent tenants are small (1M nodes / bf16 tables: ~6.3 GB on a
    16 GB chip); an OOM when they are not (2.5M nodes). Callers that
    know their persistent footprint (tasks, after placing tables +
    graph) pass ``free_bytes`` — the HBM left for the refresh transient
    — and the chunk halves (power of two, floor 8192) until both
    materializations fit.
    """
    if free_bytes is None:
        return REFRESH_CHUNK
    wavefront = 1
    for h in cfg.hop_sampling_sizes[:-1]:
        wavefront *= h
    from pmgt_tpu.sampling.mcn import _draw_path

    path = _draw_path(graph)
    lanes = {
        "packed16": graph.draw_packed16.shape[-1],
        "packed": graph.draw_packed.shape[-1],
        # split path gathers three [*, max_deg] tables per frontier
        "split": 3 * graph.nbr_ids.shape[-1],
        # flat path (max_deg > ROW_DRAW_MAX_DEG): three element gathers
        # of [*, num] per frontier node at the last hop — the transient
        # scales with the hop draw count, not max_deg
        "flat": 3 * cfg.hop_sampling_sizes[-1],
    }[path]
    chunk = REFRESH_CHUNK
    while chunk > 8192 and 2 * chunk * wavefront * lanes * 4 > free_bytes:
        chunk //= 2
    return chunk


class PretrainBatch(NamedTuple):
    """One fused PMGT pretraining batch (all fixed shapes).

    S = 1 + max_ctx_neigh; P = pairs per target (max_total_samples when
    training, 2 for eval).
    """

    target_ids: jnp.ndarray  # [B, S] int32
    target_mask: jnp.ndarray  # [B, S] float32
    pair_ids: jnp.ndarray  # [B, P, S] int32
    pair_mask: jnp.ndarray  # [B, P, S] float32 (attention mask)
    labels: jnp.ndarray  # [B, P] float32 (1 = pos, 0 = neg)
    pair_valid: jnp.ndarray  # [B, P] float32 (0 = padded-out pair slot)


def sample_pairs(
    graph: PaddedGraph,
    targets: jnp.ndarray,
    key: jax.Array,
    cfg: SamplingConfig,
    is_training: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample pos/neg pair nodes for each target.

    Returns:
        pair_nodes: [B, P] int32 node ids (pos slots first, then negs).
        labels: [B, P] float32.
        pair_valid: [B, P] float32 — 0 only when a pos slot could not be
            filled (isolated target in eval mode).
    """
    nbr_ids = jnp.asarray(graph.nbr_ids)
    degrees = jnp.asarray(graph.degrees)
    # cfg.num_total: the TRUE node universe — sharded graph tables pad
    # their leading axis to a device multiple, and counting the padding
    # into the complement would draw phantom ids as negatives.
    n_total = cfg.num_total or nbr_ids.shape[0]
    batch = targets.shape[0]

    max_pos = (
        cfg.max_total_samples - cfg.min_neg_samples if is_training else 1
    )
    total = cfg.max_total_samples if is_training else 2

    key_pos, key_neg = jax.random.split(key)

    # --- positives: uniform without replacement over direct neighbors ---
    t_nbrs = nbr_ids[targets]  # [B, D]
    t_deg = degrees[targets]  # [B]
    d = t_nbrs.shape[1]
    rand_keys = jax.random.uniform(key_pos, (batch, d))
    valid_nbr = jnp.arange(d)[None, :] < t_deg[:, None]
    rand_keys = jnp.where(valid_nbr, rand_keys, -jnp.inf)
    # Graphs sparser than max_pos (padded max degree < positives asked
    # for): top_k requires k <= row width, so select what exists and pad
    # — the padded slots are masked by num_pos below, which is clamped
    # to the STORED neighbor count (d) so a degree-capped node can never
    # mark a pad slot positive.
    k_eff = min(max_pos, d)
    _, pos_idx = jax.lax.top_k(rand_keys, k_eff)  # [B, k_eff]
    pos_nodes = jnp.take_along_axis(t_nbrs, pos_idx, axis=1)  # [B, k_eff]
    if k_eff < max_pos:
        pos_nodes = jnp.pad(pos_nodes, ((0, 0), (0, max_pos - k_eff)))
    num_pos = jnp.minimum(jnp.minimum(t_deg, d), max_pos)  # [B]
    pos_slot = jnp.arange(max_pos)[None, :] < num_pos[:, None]
    pos_nodes = jnp.where(pos_slot, pos_nodes, 0)

    # --- negatives: exact uniform over the non-neighbor set -----------
    # Order-statistics rank selection over the sorted neighbor rows (the
    # distribution the reference's rejection ``while`` converges to,
    # reference datasets.py:173-180): draw a uniform rank in
    # [0, |[2, N+2) \ neighbors|), walk the sorted neighbors to the
    # rank-th absent id. One randint per draw, O(max_deg) walk, no dense
    # [B, N_total] membership scatter and no silent-positive mode.
    t_sorted = jnp.asarray(graph.nbr_sorted)[targets]  # [B, D] row gather
    comp = n_total - NUM_SPECIAL_NODES - t_deg[:, None]  # [B, 1]
    rank = jax.random.randint(
        key_neg, (batch, total), 0, jnp.maximum(comp, 1), dtype=jnp.int32
    )
    neg_nodes = complement_rank_select(
        t_sorted, rank, NUM_SPECIAL_NODES, n_total
    )
    # Invalid only when the complement is empty (target adjacent to every
    # node) — then no correct negative exists and the slot is masked out.
    neg_ok = jnp.broadcast_to(comp > 0, (batch, total)).astype(jnp.float32)

    # --- lay out pos slots first, negatives fill the rest -------------
    slot = jnp.arange(total)[None, :]  # [1, P]
    pos_padded = jnp.pad(pos_nodes, ((0, 0), (0, total - max_pos)))
    is_pos = slot < num_pos[:, None]
    pair_nodes = jnp.where(is_pos, pos_padded, neg_nodes).astype(jnp.int32)
    labels = is_pos.astype(jnp.float32)

    if is_training:
        # All P slots are filled (num_neg tops up to P); a neg slot is
        # invalid only in the degenerate complement-empty case.
        pair_valid = jnp.where(is_pos, 1.0, neg_ok)
    else:
        # Eval: slot 0 is the positive (invalid if the target is isolated),
        # slot 1 the negative (invalid only if the complement is empty).
        pair_valid = jnp.where(
            (slot == 0) & (num_pos[:, None] == 0), 0.0, jnp.where(is_pos, 1.0, neg_ok)
        )
        # Isolated targets get the neg candidate in slot 0 as well, but the
        # mask removes it from every loss/metric.
        pair_nodes = jnp.where(
            (slot == 0) & (num_pos[:, None] == 0), neg_nodes, pair_nodes
        )

    return pair_nodes, labels, pair_valid


def make_pretrain_batch(
    graph: PaddedGraph,
    targets: jnp.ndarray,
    key: jax.Array,
    cfg: SamplingConfig,
    is_training: bool = True,
) -> PretrainBatch:
    """Assemble a full fixed-shape PMGT pretraining batch on device.

    Collapses the reference's per-sample Python loop of encoder calls
    (reference pmgt/pmgt/models.py:104-127) into dense [B, P, S] tensors
    consumed by a single batched encoder pass. Samples a fresh context for
    the target and every pair node — the reference's exact behavior.
    """
    batch = targets.shape[0]
    key_ctx, key_pairs, key_pair_ctx = jax.random.split(key, 3)

    target_ids, target_mask = sample_context(graph, targets, key_ctx, cfg)
    pair_nodes, labels, pair_valid = sample_pairs(
        graph, targets, key_pairs, cfg, is_training
    )

    p = pair_nodes.shape[1]
    flat_pairs = pair_nodes.reshape(-1)
    pair_ids, pair_mask = sample_context(graph, flat_pairs, key_pair_ctx, cfg)
    seq = target_ids.shape[1]
    pair_ids = pair_ids.reshape(batch, p, seq)
    pair_mask = pair_mask.reshape(batch, p, seq)

    return PretrainBatch(
        target_ids=target_ids,
        target_mask=target_mask,
        pair_ids=pair_ids,
        pair_mask=pair_mask,
        labels=labels,
        pair_valid=pair_valid,
    )


def sample_all_contexts(
    graph: PaddedGraph,
    key: jax.Array,
    cfg: SamplingConfig,
    num_total: int,
    all_nodes: Optional[jnp.ndarray] = None,
    chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample one context per node for ALL nodes → cache tables
    [N_total, S] (rows 0/1 are the special ids, context-free).

    Rationale: the reference draws a fresh context for every *occurrence*
    of a node — once as the epoch's target plus ~10 pair appearances —
    ~11x more sampling work than one context per node per epoch for the
    same marginal distribution. Caching per epoch keeps each node's
    context re-drawn exactly as often as the reference re-draws its
    *target* context, and removes graph sampling from the train step's
    critical path entirely.

    Pass ``all_nodes`` (device arange) from outside the jit: an internal
    ``jnp.arange`` becomes a compile-time constant frontier and pushes the
    TPU dynamic gathers off their fast path (measured 185 ms vs 0.7 ms for
    a full TG-scale refresh).
    """
    if all_nodes is None:
        all_nodes = jnp.arange(num_total, dtype=jnp.int32)
    # Gate on the EFFECTIVE chunk, not the constant: a caller-computed
    # memory-pressure chunk (effective_refresh_chunk) must chunk a
    # mid-size graph too — gating on REFRESH_CHUNK alone silently took
    # the single-shot branch for num_total <= 65,536 and materialized
    # the exact transient the caller's free_bytes budget ruled out.
    eff_chunk = REFRESH_CHUNK if chunk is None else chunk
    if num_total > eff_chunk:
        chunk = eff_chunk
        # Beyond ~10^5 nodes the all-at-once wavefront row-gather
        # intermediate ([N * prod(hops[:-1]), max_deg] inside
        # _alias_draw) exceeds HBM — measured 20.5 GB at 1M nodes /
        # 38 max_deg. lax.map over fixed node chunks bounds it while
        # staying ONE dispatch; at or below the threshold the
        # single-shot path is kept so existing streams stay
        # bit-identical. ``chunk`` (from effective_refresh_chunk,
        # computed by the task against its persistent HBM footprint)
        # shrinks the per-chunk transient only under memory pressure —
        # chunk latency dominates, so bigger is faster.
        c = -(-num_total // chunk)
        pad = c * chunk - num_total
        nodes_p = jnp.concatenate(
            [all_nodes, jnp.zeros((pad,), jnp.int32)]
        ).reshape(c, chunk)
        keys = jax.random.split(key, c)

        def one(args_):
            nodes_c, k = args_
            return sample_context(graph, nodes_c, k, cfg)

        ids, mask = jax.lax.map(one, (nodes_p, keys))
        s = ids.shape[-1]
        ids = ids.reshape(c * chunk, s)[:num_total]
        mask = mask.reshape(c * chunk, s)[:num_total]
    else:
        ids, mask = sample_context(graph, all_nodes, key, cfg)
    # Special rows: context-free (target-only mask).
    special = jnp.zeros((NUM_SPECIAL_NODES, ids.shape[1] - 1), jnp.int32)
    ids = ids.at[:NUM_SPECIAL_NODES, 1:].set(special)
    mask = mask.at[:NUM_SPECIAL_NODES, 1:].set(0.0)
    return ids, mask


def make_pretrain_batch_cached(
    graph: PaddedGraph,
    ctx_ids: jnp.ndarray,  # [N_total, S] cached context table
    ctx_mask: jnp.ndarray,  # [N_total, S]
    targets: jnp.ndarray,
    key: jax.Array,
    cfg: SamplingConfig,
    is_training: bool = True,
    pair_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
) -> PretrainBatch:
    """Batch assembly from per-epoch caches: pure gathers. With
    ``pair_cache`` (from ``sample_all_pairs``) even the pos/neg pair draw
    leaves the hot path; otherwise pairs are sampled fresh per step."""
    if pair_cache is not None:
        all_nodes, all_labels, all_valid = pair_cache
        pair_nodes = all_nodes[targets]
        labels = all_labels[targets]
        pair_valid = all_valid[targets]
    else:
        pair_nodes, labels, pair_valid = sample_pairs(
            graph, targets, key, cfg, is_training
        )
    target_ids = ctx_ids[targets]
    target_mask = ctx_mask[targets]
    pair_ids = ctx_ids[pair_nodes]  # [B, P, S]
    pair_mask = ctx_mask[pair_nodes]
    return PretrainBatch(
        target_ids=target_ids,
        target_mask=target_mask,
        pair_ids=pair_ids,
        pair_mask=pair_mask,
        labels=labels,
        pair_valid=pair_valid,
    )


def sample_all_pairs(
    graph: PaddedGraph,
    key: jax.Array,
    cfg: SamplingConfig,
    num_total: int,
    is_training: bool = True,
    chunk_size: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample pos/neg pairs for ALL nodes once (per epoch) → tables
    [N_total, P]. Same refresh rate as the reference (each node is a
    target once per epoch and re-draws its pairs then,
    reference datasets.py:113-165)."""
    n_chunks = (num_total + chunk_size - 1) // chunk_size
    keys = jax.random.split(key, n_chunks)
    # lax.map rather than an unrolled Python loop: bit-identical (same
    # chunking, same per-chunk keys) but the HLO stays constant-size in
    # the graph (489 unrolled sample_pairs bodies at 1M nodes otherwise)
    # and the chunk ids enter as traced values — the gather fast path
    # (see sample_all_contexts' docstring).
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
    offsets = jnp.arange(chunk_size, dtype=jnp.int32)

    def one(args_):
        start, k = args_
        return sample_pairs(graph, start + offsets, k, cfg, is_training)

    nodes_c, labels_c, valid_c = jax.lax.map(one, (starts, keys))
    nodes = nodes_c.reshape((n_chunks * chunk_size,) + nodes_c.shape[2:])
    labels = labels_c.reshape((n_chunks * chunk_size,) + labels_c.shape[2:])
    valid = valid_c.reshape((n_chunks * chunk_size,) + valid_c.shape[2:])
    nodes, labels, valid = (
        nodes[:num_total], labels[:num_total], valid[:num_total]
    )
    # Special rows (<pad>/<mask>) should never be targets; mask them out.
    valid = valid.at[:NUM_SPECIAL_NODES].set(0.0)
    return nodes, labels, valid
