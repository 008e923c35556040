"""MCNSampling: contextual-neighborhood sampling, vectorized for TPU.

The reference samples per node in Python/networkx inside DataLoader workers
(reference pmgt/pmgt/datasets.py:14-53): hop-wise weighted sampling with
replacement (per-node softmax over edge weights), frequency scoring
``score[node] += freq * (depth - k + 1)``, then the top ``max_ctx_neigh``
nodes by score become the context.

This file reproduces the same *distribution* as one jitted, fully-batched
function of a PRNG key. Two implementations:

- ``sample_context`` (default, production): Walker **alias-table** draws
  (O(1) per draw, no max-degree factor in the hot path) + **sort-based
  segment scoring** — the ~656 draws per target are sorted by node id and
  per-node scores come from segmented cumulative sums, so the working set
  is [B, draws] instead of a dense [B, N] scatter buffer, and top-k runs
  over 656 candidates instead of N.
- ``sample_context_dense`` (reference implementation for cross-checking):
  `jax.random.categorical` over padded weight logits + dense scatter-add
  scoring + top-k over all N nodes.

Both break score ties by smallest node id (the reference breaks them by
dict insertion order — a distributional equivalence, not a bit-exact RNG
match).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pmgt_tpu.core.config import SamplingConfig
from pmgt_tpu.graph.container import (
    NUM_SPECIAL_NODES,
    ROW_DRAW_MAX_DEG,
    PaddedGraph,
)

# Segment-sort implementation knob, read at trace time: "auto" picks the
# packed single-operand sort whenever (N+1) << m_bits fits int32 (always,
# until ~270M nodes at depth 3). "packed" / "variadic" force a path for
# within-process A/Bs (tools/ab_refresh.py).
SORT_IMPL = "auto"

# Row-draw gather knob, read at trace time: "auto" prefers the narrow
# 16-bit-id fused table (graph.draw_packed16, materialized whenever
# N+2 <= 65,536 — the hop gather and the relayout feeding the slot
# selection are BYTES-bound, so the 2D+1-lane row beats the 3D+1-lane
# one), then the wide fused table (draw_packed), then the legacy split
# tables. "packed16"/"packed"/"split" force a path for within-process
# A/Bs; forcing a path whose table is a placeholder raises
# (KEEP_WIDE_PACKED / KEEP_SPLIT_TABLES materialize the extras).
DRAW_IMPL = "auto"

# Top-k implementation knob, read at trace time: "auto" uses k iterated
# masked-argmax passes for tiny k AND small-to-medium row counts (the
# scorer takes max_ctx_neigh=5 of ~656 lanes; XLA's sort-based
# lax.top_k was the single hottest op of the exact-mode device step at
# 1.47 ms). Interleaved A/Bs (tools/ab_refresh.py --ab topk): iterative
# WINS at 5,120 rows (exact step 21.8 -> 19.96 ms) and 10,836 rows (TG
# refresh 18.1 -> 15.5 ms) but LOSES at 65,536 rows (the chunked-
# refresh chunk: 100k-node refresh 202.9 -> 217.9 ms) — the k masked
# rewrite passes sweep the whole [rows, T] buffer through HBM, which
# stops paying once the buffer far exceeds VMEM. "iterative" / "xla"
# force a path for A/Bs.
TOPK_IMPL = "auto"
ITERATIVE_TOPK_MAX_K = 16
# Boundary between the measured iterative wins (10,836 and 32,768
# rows) and the measured loss at 65,536 rows. Round-4 interleaved A/B
# at exactly 32,768 rows (tools/ab_refresh.py --num-nodes 32768 --ab
# topk): iterative 44.97 vs xla 54.91 ms/refresh median, iterative
# faster every rep — so the boundary is inclusive-safe; the true
# crossover sits somewhere in (32,768, 65,536), where no production
# workload traces (the chunked refresh chunks at exactly 65,536).
ITERATIVE_TOPK_MAX_ROWS = 32_768

def _draw_path(graph: PaddedGraph) -> str:
    """Resolve DRAW_IMPL for a graph to 'packed16'/'packed'/'split'.
    Forcing a path whose tables are placeholders raises — a silent
    fallback would corrupt draw-path A/Bs (both sides timing the same
    code)."""
    available = {
        "packed16": graph.draw_packed16.shape[0] > 1,
        "packed": graph.draw_packed.shape[0] > 1,
        "split": graph.draw_ids.shape[0] > 1,
        # Large-degree graphs (max_deg > ROW_DRAW_MAX_DEG, e.g. the
        # published co-review graphs' 288 cap) materialize the flat
        # per-(node, slot) element tables instead of row tables.
        "flat": graph.alias_primary.shape[0] > 1,
    }
    if DRAW_IMPL == "auto":
        for path in ("packed16", "packed", "split", "flat"):
            if available[path]:
                return path
        raise ValueError(
            "graph has no draw tables; rebuild it with "
            "graph.container (from_edges/load)"
        )
    if DRAW_IMPL not in available:
        raise ValueError(f"unknown DRAW_IMPL {DRAW_IMPL!r}")
    if not available[DRAW_IMPL]:
        raise ValueError(
            f"DRAW_IMPL={DRAW_IMPL!r} forced but its table is a "
            "placeholder; build the graph with container."
            "KEEP_WIDE_PACKED / KEEP_SPLIT_TABLES as needed"
        )
    return DRAW_IMPL


def _use_packed_sort(n_total: int, m_bits: int) -> bool:
    """Resolve SORT_IMPL for a graph: packed needs (id << m_bits) | w to
    fit int32 for every id <= n_total. A forced 'packed' that cannot
    pack raises — a silent variadic fallback would corrupt
    packed-vs-variadic A/Bs (both sides timing the same code)."""
    fits = (n_total + 1) << m_bits < 2**31
    if SORT_IMPL == "auto":
        return fits
    if SORT_IMPL == "packed" and not fits:
        raise ValueError(
            f"SORT_IMPL='packed' forced but (N+1) << {m_bits} overflows "
            f"int32 at N={n_total}"
        )
    return SORT_IMPL == "packed"


def _use_iterative_topk(k: int, rows: int) -> bool:
    """Resolve TOPK_IMPL for a given (k, row count) — see knob comment."""
    if TOPK_IMPL == "auto":
        return k <= ITERATIVE_TOPK_MAX_K and rows <= ITERATIVE_TOPK_MAX_ROWS
    if TOPK_IMPL == "iterative":
        return True
    if TOPK_IMPL == "xla":
        return False
    raise ValueError(f"unknown TOPK_IMPL {TOPK_IMPL!r}")


def _topk_scores(scores: jnp.ndarray, k: int):
    """Top-k over the trailing axis of the segment scores.

    For tiny static k this runs k unrolled masked-argmax passes instead
    of ``jax.lax.top_k`` (which lowers to a sort of the whole lane axis):
    ~5 streaming passes over [B, T] beat the 1.47 ms sort-based top-k on
    the exact-mode device trace. Selection agrees with ``lax.top_k``
    wherever it matters: finite score ties break to the lower index in
    both (argmax returns the first maximum; masking that exact column
    promotes the next). The one divergence is rows whose remaining
    entries are ALL -inf — masking -inf with -inf is a no-op, so
    argmax keeps returning the first such column where lax.top_k would
    enumerate ascending columns. Callers mask those entries out
    (``top_vals > 0`` ⇒ id 0, mask 0), so the *caller-visible* outputs
    are bit-identical; tests/test_sampling.py asserts it.
    """
    rows = int(np.prod(scores.shape[:-1]))
    if not _use_iterative_topk(k, rows):
        return jax.lax.top_k(scores, k)
    cols = jnp.arange(scores.shape[-1], dtype=jnp.int32)
    s = scores
    vals, poss = [], []
    for _ in range(k):
        pos = jnp.argmax(s, axis=-1).astype(jnp.int32)
        vals.append(jnp.max(s, axis=-1))
        poss.append(pos)
        s = jnp.where(cols == pos[..., None], -jnp.inf, s)
    return jnp.stack(vals, axis=-1), jnp.stack(poss, axis=-1)


def _select_slots(slot, *tables):
    """Select each table's lane at ``slot`` via one-hot multiply + lane
    reduce: tables [B, F, D]; slot [B, F, num] → [B, F, num] outputs.
    Exact (bit-identical to indexing): a lane's value times an exact
    one-hot sums to that lane's value — ints exactly, and for f32 adding
    exact zeros is exact. XLA pays one relayout copy of the gathered
    buffer to make the lane reduce a sublane reduce; an unrolled
    where-chain that avoids the relayout measured +6.2 ms/step WORSE on
    the exact-mode step (D−1 extra sweeps of the buffer, ab_step
    interleaved A/B, round 4) — the real lever is fewer gathered bytes
    (draw_packed16), not the reduce layout."""
    d = tables[0].shape[-1]
    sel = slot[..., None] == jnp.arange(d)[None, None, None, :]
    out = []
    for t in tables:
        if jnp.issubdtype(t.dtype, jnp.integer):
            out.append(jnp.sum(t[:, :, None, :] * sel, axis=-1,
                               dtype=jnp.int32))
        else:
            out.append(jnp.sum(t[:, :, None, :] * sel.astype(t.dtype),
                               axis=-1))
    return out


def _alias_draw(
    graph: PaddedGraph, frontier: jnp.ndarray, num: int, key: jax.Array
) -> jnp.ndarray:
    """Draw ``num`` weighted neighbors per frontier node via alias tables.

    The slot comes from the integer part of u * degree, the acceptance
    uniform from its fractional part (independent of the slot conditioned
    on it; one uniform per draw).

    Gather strategy (static on max_degree): for small-degree graphs each
    frontier node's draw rows are fetched once with TPU *row* gathers —
    ~7x faster than per-draw element gathers on honest device traces —
    and the slot/acceptance selection happens in-register via a one-hot
    lane reduction. Large-degree graphs fall back to flat per-draw
    element gathers whose volume is independent of max_degree.

    frontier: [B, F] node ids → returns [B, F * num] sampled node ids.
    """
    d = graph.nbr_ids.shape[1]
    b, f = frontier.shape
    u = jax.random.uniform(key, (b, f, num))

    # _draw_path resolves by which tables the container materialized
    # (row tables exist iff max_deg <= ROW_DRAW_MAX_DEG), so large-degree
    # graphs resolve to 'flat' under auto and a forced row impl RAISES
    # instead of silently timing the flat path on both sides of an A/B.
    path = _draw_path(graph)
    if path != "flat":
        if path == "packed16":
            # ONE row gather of the narrow [(primary|alias<<16) pairs |
            # prob bits | deg] table — 2D+1 lanes. The hop gather and the
            # relayout copy feeding the slot selection are bytes-bound on
            # the gathered [B, F, row] buffer, so the 16-bit id packing
            # is a direct −33% on both; prob bits stay exact f32 so the
            # draws are bit-identical to the wide layouts.
            rows = jnp.asarray(graph.draw_packed16)[frontier]  # [B,F,2D+1]
            rows_pair = rows[..., :d]
            rows_prob = jax.lax.bitcast_convert_type(
                rows[..., d : 2 * d], jnp.float32
            )
            deg = jnp.maximum(rows[..., 2 * d], 1)[..., None]  # [B, F, 1]
            scaled = u * deg
            slot = jnp.minimum(scaled.astype(jnp.int32), deg - 1)
            frac = scaled - slot.astype(scaled.dtype)
            pair, prob = _select_slots(slot, rows_pair, rows_prob)
            # Decode AFTER the slot selection (on the small [B, F, num]
            # buffer). Logical shift: the alias id may set the sign bit.
            primary = pair & 0xFFFF
            alias = jax.lax.shift_right_logical(pair, 16)
        else:
            if path == "packed":
                # ONE row gather of the fused [ids | alias | prob bits |
                # deg] table (3D+1 lanes). Row gathers are row-count-
                # bound (~230M rows/s), so one wide gather beats the
                # three separate gathers it replaced; the slices below
                # are lane-offset views that XLA fuses into the one-hot
                # reductions.
                rows = jnp.asarray(graph.draw_packed)[frontier]  # [B,F,3D+1]
                rows_ids = rows[..., :d]
                rows_alias = rows[..., d : 2 * d]
                rows_prob = jax.lax.bitcast_convert_type(
                    rows[..., 2 * d : 3 * d], jnp.float32
                )
                deg = jnp.maximum(rows[..., 3 * d], 1)[..., None]  # [B,F,1]
            else:  # legacy split tables (A/B only)
                rows_full = jnp.asarray(graph.draw_ids)[frontier]  # [B,F,D+1]
                rows_ids = rows_full[..., :d]
                rows_alias = jnp.asarray(graph.alias_node)[frontier]
                rows_prob = jnp.asarray(graph.alias_prob)[frontier]
                deg = jnp.maximum(rows_full[..., d], 1)[..., None]
            scaled = u * deg
            slot = jnp.minimum(scaled.astype(jnp.int32), deg - 1)
            frac = scaled - slot.astype(scaled.dtype)
            primary, alias, prob = _select_slots(
                slot, rows_ids, rows_alias, rows_prob
            )
        sampled = jnp.where(frac < prob, primary, alias)
        return sampled.reshape(b, f * num)

    degrees = jnp.asarray(graph.degrees)
    deg = jnp.maximum(degrees[frontier], 1)[..., None]  # [B, F, 1]
    scaled = u * deg
    slot = jnp.minimum(scaled.astype(jnp.int32), deg - 1)
    frac = scaled - slot.astype(scaled.dtype)  # acceptance uniform

    flat = frontier[..., None] * d + slot  # [B, F, num]
    # Three flat gathers; keep the operands as unmodified arrays.
    primary = jnp.asarray(graph.alias_primary)[flat]
    alias = jnp.asarray(graph.alias_alias)[flat]
    prob = jax.lax.bitcast_convert_type(
        jnp.asarray(graph.alias_prob_bits)[flat], jnp.float32
    )
    sampled = jnp.where(frac < prob, primary, alias)
    return sampled.reshape(b, f * num)


def sample_context(
    graph: PaddedGraph,
    targets: jnp.ndarray,
    key: jax.Array,
    cfg: SamplingConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample contextual neighborhoods for a batch of target nodes.

    Args:
        graph: PaddedGraph with device arrays.
        targets: [B] int32 node ids (real nodes are >= 2).
        key: PRNG key.
        cfg: sampling configuration.

    Returns:
        node_ids: [B, 1 + max_ctx_neigh] int32 — target followed by context
            nodes ordered by descending score, 0-padded.
        attention_mask: [B, 1 + max_ctx_neigh] float32.
    """
    batch = targets.shape[0]
    depth = len(cfg.hop_sampling_sizes)

    hop_keys = jax.random.split(key, depth)
    frontier = targets[:, None]
    all_ids = []
    all_ws = []
    for k, sample_size in enumerate(cfg.hop_sampling_sizes):
        sampled = _alias_draw(graph, frontier, sample_size, hop_keys[k])
        # score weight (depth - k) for 0-based k == reference's
        # (depth - k + 1) with 1-based k (datasets.py:40).
        all_ids.append(sampled)
        all_ws.append(
            jnp.full(sampled.shape, float(depth - k), jnp.float32)
        )
        frontier = sampled

    ids = jnp.concatenate(all_ids, axis=1)  # [B, T]
    ws = jnp.concatenate(all_ws, axis=1)  # [B, T]

    # Exclude the target itself and special ids from scoring
    # (datasets.py:38-39) by zeroing their weights.
    ws = jnp.where(
        (ids == targets[:, None]) | (ids < NUM_SPECIAL_NODES), 0.0, ws
    )

    # ---- segmented scoring over the sorted draw multiset ----
    # The weights ride the sort packed into the ids' low bits: hop
    # weights are tiny ints (<= depth), so ``(id << m_bits) | w`` sorts
    # by id with ONE unstable single-operand sort. The previous stable
    # variadic sort((ids, ws), num_keys=1) ran as THREE [B, T] operands
    # on device — XLA materializes an iota payload for stability — each
    # with layout copies in and out of the sort custom-call; device
    # traces showed the sort path at ~9 of the 23 ms TG-scale refresh.
    # Identical outputs (not just distribution): segment-end positions
    # depend only on the sorted id order, and segment sums of exact
    # small-integer f32 weights are invariant to intra-segment order.
    # (An earlier formulation, argsort + two post-sort take_along_axis
    # gathers, measured 69 ms per gather on v5e — bad gather layout.)
    m_bits = depth.bit_length()  # weights fit in [0, depth]
    n_total = graph.nbr_ids.shape[0]
    if _use_packed_sort(n_total, m_bits):
        packed = (ids << m_bits) | ws.astype(jnp.int32)
        spacked = jax.lax.sort(packed, dimension=1, is_stable=False)
        sid = spacked >> m_bits
        sw = (spacked & ((1 << m_bits) - 1)).astype(jnp.float32)
    else:  # id<<m_bits would overflow int32 (N ~> 2^31 / 2^m_bits)
        sid, sw = jax.lax.sort((ids, ws), dimension=1, num_keys=1)
    csum = jnp.cumsum(sw, axis=1)
    ecsum = csum - sw  # exclusive cumsum

    first = jnp.concatenate(
        [
            jnp.ones((batch, 1), bool),
            sid[:, 1:] != sid[:, :-1],
        ],
        axis=1,
    )
    last = jnp.concatenate(
        [
            sid[:, 1:] != sid[:, :-1],
            jnp.ones((batch, 1), bool),
        ],
        axis=1,
    )
    # Segment-start exclusive cumsum propagated to every position:
    # weights are >= 0 so csum is nondecreasing and a running max works.
    start_ecsum = jax.lax.cummax(
        jnp.where(first, ecsum, -jnp.inf), axis=1
    )
    seg_score = csum - start_ecsum  # valid at segment-end positions

    neg_inf = jnp.float32(-jnp.inf)
    scores = jnp.where(last & (seg_score > 0.0), seg_score, neg_inf)

    top_vals, top_pos = _topk_scores(scores, cfg.max_ctx_neigh)
    valid = top_vals > 0.0
    ctx_ids = jnp.where(
        valid, jnp.take_along_axis(sid, top_pos, axis=1), 0
    ).astype(jnp.int32)

    node_ids = jnp.concatenate(
        [targets[:, None].astype(jnp.int32), ctx_ids], axis=1
    )
    attention_mask = jnp.concatenate(
        [jnp.ones((batch, 1), jnp.float32), valid.astype(jnp.float32)], axis=1
    )
    return node_ids, attention_mask


# ----------------------------------------------------------------------
# dense reference implementation (kept for cross-checking in tests)
# ----------------------------------------------------------------------

def sample_context_dense(
    graph: PaddedGraph,
    targets: jnp.ndarray,
    key: jax.Array,
    cfg: SamplingConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Categorical-over-logits draws + dense scatter scoring (original
    formulation; O(B·N) memory)."""
    nbr_ids = jnp.asarray(graph.nbr_ids)
    nbr_logits = jnp.asarray(graph.nbr_logits)
    n_total = nbr_ids.shape[0]
    batch = targets.shape[0]
    depth = len(cfg.hop_sampling_sizes)

    scores = jnp.zeros((batch, n_total), dtype=jnp.float32)
    frontier = targets[:, None]

    hop_keys = jax.random.split(key, depth)
    for k, sample_size in enumerate(cfg.hop_sampling_sizes):
        f_logits = nbr_logits[frontier]
        f_ids = nbr_ids[frontier]
        draws = jax.random.categorical(
            hop_keys[k],
            f_logits,
            axis=-1,
            shape=(sample_size,) + frontier.shape,
        )
        draws = jnp.moveaxis(draws, 0, -1)
        sampled = jnp.take_along_axis(f_ids, draws, axis=-1)
        sampled = sampled.reshape(batch, -1)
        scores = _scatter_add_rows(scores, sampled, jnp.float32(depth - k))
        frontier = sampled

    special = jnp.zeros((batch, NUM_SPECIAL_NODES), dtype=scores.dtype)
    scores = jax.lax.dynamic_update_slice(scores, special, (0, 0))
    scores = _scatter_set_rows(scores, targets[:, None], 0.0)

    top_vals, top_ids = jax.lax.top_k(scores, cfg.max_ctx_neigh)
    valid = top_vals > 0.0
    ctx_ids = jnp.where(valid, top_ids, 0).astype(jnp.int32)

    node_ids = jnp.concatenate(
        [targets[:, None].astype(jnp.int32), ctx_ids], axis=1
    )
    attention_mask = jnp.concatenate(
        [jnp.ones((batch, 1), jnp.float32), valid.astype(jnp.float32)], axis=1
    )
    return node_ids, attention_mask


def complement_rank_select(
    sorted_rows: jnp.ndarray,
    rank: jnp.ndarray,
    lo: int,
    hi: int,
) -> jnp.ndarray:
    """The rank-th smallest id in [lo, hi) NOT present in the row's
    sorted member set (order-statistics walk: ans starts at lo + rank and
    is bumped past every member ≤ ans; members are sorted ascending and
    distinct, pads must be ≥ hi).

    O(row_width) per draw with no dense [rows, hi] membership buffer —
    drawing a uniform rank in [0, hi - lo - row_count) gives an *exact*
    uniform sample over the complement (the distribution a rejection
    ``while`` loop converges to).

    Args:
        sorted_rows: [M, W] ascending member ids, padded with ≥ hi.
        rank: [M, K] int ranks.
    Returns:
        [M, K] int32 ids, clamped to hi - 1 when the complement is empty.
    """

    def body(j, ans):
        p = jax.lax.dynamic_index_in_dim(sorted_rows, j, axis=1, keepdims=True)
        return ans + (p <= ans).astype(ans.dtype)

    ans = jax.lax.fori_loop(
        0, sorted_rows.shape[1], body, lo + rank.astype(jnp.int32)
    )
    return jnp.minimum(ans, hi - 1)


def _scatter_add_rows(buf, col_ids, value):
    """buf[b, col_ids[b, j]] += value for all b, j (duplicates accumulate)."""
    batch, n = buf.shape
    rows = jnp.broadcast_to(
        jnp.arange(batch, dtype=col_ids.dtype)[:, None], col_ids.shape
    )
    flat = buf.reshape(-1)
    idx = (rows * n + col_ids).reshape(-1)
    flat = flat.at[idx].add(value, mode="drop")
    return flat.reshape(batch, n)


def _scatter_set_rows(buf, col_ids, value):
    """buf[b, col_ids[b, j]] = value for all b, j."""
    batch, n = buf.shape
    rows = jnp.broadcast_to(
        jnp.arange(batch, dtype=col_ids.dtype)[:, None], col_ids.shape
    )
    flat = buf.reshape(-1)
    idx = (rows * n + col_ids).reshape(-1)
    flat = flat.at[idx].set(value, mode="drop")
    return flat.reshape(batch, n)
