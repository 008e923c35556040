"""Padded-CSR graph container for on-device sampling.

The reference keeps the item graph as a networkx object and samples
neighborhoods in Python inside DataLoader workers (reference
pmgt/pmgt/datasets.py:14-53) — the dominant cost of its training loop. The
TPU-native design preprocesses the graph once into fixed-shape arrays so
that all sampling becomes jitted gathers + `jax.random.categorical`:

- ``nbr_ids[n, d]``    — d-th neighbor of node n (node-id space; 0 = <pad>)
- ``nbr_logits[n, d]`` — edge weight, ``-inf`` on padding. Passing raw
  weights as categorical logits reproduces the reference's per-node
  ``softmax(weights)`` sampling distribution exactly
  (reference datasets.py:27-32).
- ``degrees[n]``       — true neighbor count of node n.

Node-id space matches the reference convention (reference
pmgt/pmgt/trainer.py:38-41): 0 = <pad>, 1 = <mask>, real nodes are 2..N+1.
Rows 0 and 1 are sentinel rows with a single self-edge to <pad> so that
categorical sampling stays well-defined if they are ever gathered.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

NEG_INF = float("-inf")
NUM_SPECIAL_NODES = 2  # 0 = <pad>, 1 = <mask>

# Above this max_degree the row draw tables move more HBM per draw than
# the flat element gathers save; measured crossover is far higher than
# real co-review graphs' capped degrees (row path: 6 ms per 1.39M rows
# x32 lanes; element path: 43 ms per 5.5M draws). The sampler's draw-path
# choice (sampling/mcn.py _alias_draw) and the table packing below key on
# the same constant so only the variant actually used is materialized —
# the other would just double alias-table HBM on every device.
ROW_DRAW_MAX_DEG = 64

# A/B-only escape hatch: materialize the legacy three split row tables
# (draw_ids/alias_node + the core alias_prob) ALONGSIDE draw_packed so
# tools/ab_refresh.py / ab_step.py can trace both draw paths in one
# process (sampling/mcn.py DRAW_IMPL). Production leaves this off — the
# split tables would just re-duplicate alias HBM on every device.
KEEP_SPLIT_TABLES = False

# Node counts (incl. the 2 special ids) whose ids fit 16 bits: primary
# and alias ids pack into ONE int32 lane, shrinking the draw row from
# 3*max_deg+1 to 2*max_deg+1 lanes. The hop row gather and the relayout
# copy feeding the slot selection are both BYTES-bound on the gathered
# [B, F, row] buffer (exact-mode trace: 1.19 + 0.85 ms on a 238 MB
# intermediate at TG scale), so −33% row width is a direct win.
PACK16_MAX_TOTAL = 1 << 16

# A/B-only escape hatch: materialize the wide 3*max_deg+1 draw_packed
# ALONGSIDE draw_packed16 on graphs that qualify for the narrow table,
# so the two row layouts can be traced in one process.
KEEP_WIDE_PACKED = False


class PaddedGraph(NamedTuple):
    """Fixed-shape graph arrays (a pytree; members may be numpy or jnp).

    ``alias_prob``/``alias_idx`` are Walker alias tables for O(1) weighted
    neighbor draws: sample slot j uniformly in [0, degree), accept slot j
    with probability ``alias_prob[n, j]``, else take slot ``alias_idx[n, j]``.
    This removes the max-degree factor from the sampling hot path (the
    categorical-over-padded-logits alternative gathers whole neighbor rows
    per draw)."""

    nbr_ids: np.ndarray  # [N+2, max_deg] int32
    nbr_logits: np.ndarray  # [N+2, max_deg] float32 (-inf padding)
    degrees: np.ndarray  # [N+2] int32
    alias_prob: np.ndarray  # [N+2, max_deg] float32
    alias_idx: np.ndarray  # [N+2, max_deg] int32
    # Flat draw tables [(N+2)*max_deg] int32, indexed by node*max_deg+slot
    # — the element-gather draw path, used when max_deg is large (row
    # gathers would move O(max_deg) per draw).
    alias_primary: np.ndarray  # primary neighbor id per (node, slot)
    alias_alias: np.ndarray  # alias neighbor id (slot pre-resolved)
    alias_prob_bits: np.ndarray  # accept probability, f32 bitcast to int32
    # Row draw tables — the row-gather draw path for small max_deg.
    # Honest device traces (round 2) show TPU *row* gathers run ~7x
    # faster than the same draws as flat element gathers (6 ms vs 43 ms
    # for the hop-3 refresh gather at [1.39M rows x32] vs [5.5M elems]),
    # so each frontier row is fetched once and slots are selected in
    # registers via one-hot reduction.
    #
    # ``draw_packed`` fuses everything a draw needs into ONE row:
    # ``[nbr_ids | alias ids | alias prob (f32 bits) | degree]``, width
    # 3*max_deg + 1 int32. Row gathers are row-COUNT-bound on TPU, so one
    # wide gather beats the three separate gathers it replaced (exact-mode
    # device traces: the hop gathers were 3 distinct [B, F, ~D] fusions of
    # equal cost). The legacy split tables (``draw_ids`` with its trailing
    # degree column, ``alias_node``) are placeholders unless
    # ``KEEP_SPLIT_TABLES`` — kept only for within-process draw-path A/Bs.
    #
    # ``draw_packed16`` further packs (primary | alias << 16) into one
    # lane when every id fits 16 bits (N+2 <= PACK16_MAX_TOTAL):
    # ``[id pairs | alias prob (f32 bits) | degree]``, width
    # 2*max_deg + 1 — the hop gather and its relayout are bytes-bound,
    # so the narrow row is the production table on qualifying graphs
    # (draw_packed is then a placeholder unless KEEP_WIDE_PACKED).
    # Prob bits stay exact f32: draws are bit-identical across layouts.
    draw_packed: np.ndarray  # [N+2, 3*max_deg+1] int32
    draw_packed16: np.ndarray  # [N+2, 2*max_deg+1] int32
    draw_ids: np.ndarray  # [N+2, max_deg+1] int32 (A/B only; placeholder)
    alias_node: np.ndarray  # [N+2, max_deg] int32 (A/B only; placeholder)
    # Ascending per-row neighbor ids padded with N+2 (an id past the
    # range) — negative pair sampling draws exactly from the complement
    # of this set by order-statistics rank selection (sampling/pairs.py),
    # replacing a dense [B, N] membership scatter.
    nbr_sorted: np.ndarray  # [N+2, max_deg] int32

    @property
    def num_nodes(self) -> int:
        """Number of real nodes (excluding <pad>/<mask>)."""
        return int(self.nbr_ids.shape[0]) - NUM_SPECIAL_NODES

    def runtime_view(self) -> "PaddedGraph":
        """The graph with build-only arrays dropped to 1x1 placeholders.

        ``nbr_logits`` / ``alias_prob`` / ``alias_idx`` are inputs for
        building the draw tables (and the dense cross-check sampler used
        in tests); no production jit reads them — the sampler consumes
        ``draw_packed`` (or the flat alias triple), ``nbr_ids``,
        ``degrees`` and ``nbr_sorted``. Replicating them to every device
        anyway wastes 3 x [N+2, max_deg] words of HBM per device
        (~384 MB at the 1M-node smoke scale). Tasks call this before
        ``replicate_host``; tools that A/B the legacy split draw path
        keep the full container (``alias_prob`` is that path's operand,
        so it survives the trim when the split tables are materialized).
        """
        keep_split = self.draw_ids.shape[0] > 1  # KEEP_SPLIT_TABLES A/Bs
        return self._replace(
            nbr_logits=np.zeros((1, 1), np.float32),
            alias_prob=(
                self.alias_prob if keep_split else np.zeros((1, 1), np.float32)
            ),
            alias_idx=np.zeros((1, 1), np.int32),
        )

    @property
    def num_total(self) -> int:
        """Total rows including the two special ids."""
        return int(self.nbr_ids.shape[0])

    @property
    def max_degree(self) -> int:
        return int(self.nbr_ids.shape[1])

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            nbr_ids=np.asarray(self.nbr_ids),
            nbr_logits=np.asarray(self.nbr_logits),
            degrees=np.asarray(self.degrees),
            alias_prob=np.asarray(self.alias_prob),
            alias_idx=np.asarray(self.alias_idx),
        )

    @classmethod
    def load(cls, path: str) -> "PaddedGraph":
        with np.load(path) as data:
            if "alias_prob" in data:
                alias_prob = data["alias_prob"]
                alias_idx = data["alias_idx"]
            else:  # older files: rebuild alias tables from logits
                alias_prob, alias_idx = _build_alias_tables(
                    data["nbr_logits"], data["degrees"]
                )
            packed = _pack_alias(
                data["nbr_ids"], alias_prob, alias_idx, data["degrees"]
            )
            return cls(
                nbr_ids=data["nbr_ids"],
                nbr_logits=data["nbr_logits"],
                degrees=data["degrees"],
                alias_prob=alias_prob,
                alias_idx=alias_idx,
                alias_primary=packed[0],
                alias_alias=packed[1],
                alias_prob_bits=packed[2],
                draw_packed=packed[3],
                draw_packed16=packed[4],
                draw_ids=packed[5],
                alias_node=packed[6],
                nbr_sorted=packed[7],
            )


def from_edges(
    num_nodes: int,
    edges: Sequence[Tuple[int, int, float]],
    max_degree: Optional[int] = None,
) -> PaddedGraph:
    """Build a PaddedGraph from undirected weighted edges.

    Args:
        num_nodes: number of real nodes. Edge endpoints must be in
            ``[0, num_nodes)`` — **zero-based**; they are shifted by
            ``NUM_SPECIAL_NODES`` internally.
        edges: (u, v, weight) triples; each is added in both directions.
        max_degree: optional cap. Nodes above it keep their highest-weight
            neighbors (a controlled deviation from the reference, which has
            no cap; use None for exact parity).
    """
    # Duplicate (u, v) listings overwrite (last weight wins) and
    # self-loops are dropped — networkx.Graph semantics, which the
    # reference's gpickle graphs follow. Distinct per-row neighbor ids
    # are also a hard requirement of the exact complement rank-select
    # negative sampler (sampling/pairs.py): duplicates would bias its
    # complement counts.
    adj: list[dict[int, float]] = [{} for _ in range(num_nodes)]
    for u, v, w in edges:
        if not (0 <= u < num_nodes and 0 <= v < num_nodes):
            raise ValueError(f"edge ({u},{v}) out of range [0,{num_nodes})")
        if u == v:
            continue
        adj[u][v + NUM_SPECIAL_NODES] = float(w)
        adj[v][u + NUM_SPECIAL_NODES] = float(w)
    adj_ids = [list(a.keys()) for a in adj]
    adj_ws = [list(a.values()) for a in adj]

    if max_degree is not None:
        for n in range(num_nodes):
            if len(adj_ids[n]) > max_degree:
                order = np.argsort(adj_ws[n])[::-1][:max_degree]
                adj_ids[n] = [adj_ids[n][i] for i in order]
                adj_ws[n] = [adj_ws[n][i] for i in order]

    max_deg = max((len(a) for a in adj_ids), default=0)
    max_deg = max(max_deg, 1)  # at least one slot for the sentinel edge

    n_total = num_nodes + NUM_SPECIAL_NODES
    nbr_ids = np.zeros((n_total, max_deg), dtype=np.int32)
    nbr_logits = np.full((n_total, max_deg), NEG_INF, dtype=np.float32)
    degrees = np.zeros((n_total,), dtype=np.int32)

    for n in range(num_nodes):
        row = n + NUM_SPECIAL_NODES
        deg = len(adj_ids[n])
        degrees[row] = deg
        if deg:
            nbr_ids[row, :deg] = adj_ids[n]
            nbr_logits[row, :deg] = adj_ws[n]
        else:
            # Sentinel self-edge to <pad> keeps categorical well-defined.
            nbr_logits[row, 0] = 0.0

    # Special rows (<pad>, <mask>) sample <pad> with probability 1.
    nbr_logits[0, 0] = 0.0
    nbr_logits[1, 0] = 0.0

    alias_prob, alias_idx = _build_alias_tables(nbr_logits, degrees)
    packed = _pack_alias(nbr_ids, alias_prob, alias_idx, degrees)
    return PaddedGraph(
        nbr_ids=nbr_ids,
        nbr_logits=nbr_logits,
        degrees=degrees,
        alias_prob=alias_prob,
        alias_idx=alias_idx,
        alias_primary=packed[0],
        alias_alias=packed[1],
        alias_prob_bits=packed[2],
        draw_packed=packed[3],
        draw_packed16=packed[4],
        draw_ids=packed[5],
        alias_node=packed[6],
        nbr_sorted=packed[7],
    )


def _pack_alias(
    nbr_ids: np.ndarray,
    alias_prob: np.ndarray,
    alias_idx: np.ndarray,
    degrees: np.ndarray,
) -> Tuple[np.ndarray, ...]:
    """Draw tables for the gather strategy the sampler will actually use
    (see PaddedGraph field docs). Only one variant is materialized —
    row tables for ``max_deg <= ROW_DRAW_MAX_DEG``, flat per-(node, slot)
    arrays otherwise; the other fields get 1-element placeholders so the
    unused variant costs no HBM when the graph is replicated per device.
    In both variants the alias *slot* index is pre-resolved to the alias
    *neighbor id* (removing a dependent gather)."""
    n_total, max_deg = nbr_ids.shape
    placeholder = np.zeros((1,), np.int32)
    alias_node = np.take_along_axis(nbr_ids, alias_idx, axis=1)
    slot_valid = np.arange(max_deg)[None, :] < degrees[:, None]
    nbr_sorted = np.sort(
        np.where(slot_valid, nbr_ids, n_total), axis=1
    ).astype(np.int32)
    if max_deg <= ROW_DRAW_MAX_DEG:
        prob_bits = np.ascontiguousarray(
            alias_prob.astype(np.float32)
        ).view(np.int32)
        deg_col = degrees[:, None].astype(np.int32)
        pack16 = n_total <= PACK16_MAX_TOTAL
        if pack16:
            # (primary | alias << 16) per lane; ids < 2**16 so the pair
            # is lossless. Decoded with logical shifts (the high id may
            # set the sign bit of the int32 view).
            id_pairs = (
                nbr_ids.astype(np.uint32)
                | (alias_node.astype(np.uint32) << 16)
            ).view(np.int32)
            draw_packed16 = np.ascontiguousarray(
                np.concatenate([id_pairs, prob_bits, deg_col], axis=1),
                np.int32,
            )
        else:
            draw_packed16 = placeholder.reshape(1, 1)
        if pack16 and not KEEP_WIDE_PACKED:
            draw_packed = placeholder.reshape(1, 1)
        else:
            draw_packed = np.ascontiguousarray(
                np.concatenate(
                    [
                        nbr_ids.astype(np.int32),
                        alias_node.astype(np.int32),
                        prob_bits,
                        deg_col,
                    ],
                    axis=1,
                ),
                np.int32,
            )
        if KEEP_SPLIT_TABLES:
            draw_ids = np.ascontiguousarray(
                np.concatenate(
                    [nbr_ids, degrees[:, None].astype(np.int32)], axis=1
                ),
                np.int32,
            )
            alias_node_out = np.ascontiguousarray(alias_node, np.int32)
        else:
            draw_ids = placeholder.reshape(1, 1)
            alias_node_out = placeholder.reshape(1, 1)
        return (
            placeholder,
            placeholder,
            placeholder,
            draw_packed,
            draw_packed16,
            draw_ids,
            alias_node_out,
            np.ascontiguousarray(nbr_sorted, np.int32),
        )
    if n_total * max_deg >= 2**31:
        # The jitted sampler forms flat int32 indices node*max_deg+slot
        # (sampling/mcn.py _alias_draw); larger tables would silently
        # gather from wrong rows. Cap max_degree (from_edges) to shrink
        # the table before hitting this.
        raise ValueError(
            f"flat alias table too large for int32 indexing: "
            f"{n_total} nodes x {max_deg} max_degree >= 2**31; "
            "pass max_degree to cap the neighbor lists"
        )
    return (
        np.ascontiguousarray(nbr_ids.reshape(-1), np.int32),
        np.ascontiguousarray(alias_node.reshape(-1), np.int32),
        np.ascontiguousarray(
            alias_prob.astype(np.float32).reshape(-1).view(np.int32)
        ),
        np.ascontiguousarray(placeholder.reshape(1, 1), np.int32),
        np.ascontiguousarray(placeholder.reshape(1, 1), np.int32),
        np.ascontiguousarray(placeholder.reshape(1, 1), np.int32),
        np.ascontiguousarray(placeholder.reshape(1, 1), np.int32),
        np.ascontiguousarray(nbr_sorted, np.int32),
    )


def _build_alias_tables(
    nbr_logits: np.ndarray, degrees: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Vose's alias method per node over softmax(edge weights) — the same
    distribution the reference samples from (reference datasets.py:27-32).
    O(E) preprocessing; uses the native C++ builder when available."""
    from pmgt_tpu.native import build_alias_tables_native

    native = build_alias_tables_native(nbr_logits, degrees)
    if native is not None:
        return native

    n, d = nbr_logits.shape
    alias_prob = np.ones((n, d), dtype=np.float32)
    alias_idx = np.zeros((n, d), dtype=np.int32)
    for row in range(n):
        deg = int(degrees[row])
        if deg <= 1:
            continue
        w = nbr_logits[row, :deg].astype(np.float64)
        p = np.exp(w - w.max())
        p /= p.sum()
        scaled = p * deg
        small = [j for j in range(deg) if scaled[j] < 1.0]
        large = [j for j in range(deg) if scaled[j] >= 1.0]
        prob = np.ones(deg)
        idx = np.zeros(deg, dtype=np.int32)
        while small and large:
            s = small.pop()
            l = large.pop()
            prob[s] = scaled[s]
            idx[s] = l
            scaled[l] = scaled[l] - (1.0 - scaled[s])
            (small if scaled[l] < 1.0 else large).append(l)
        for j in large:
            prob[j] = 1.0
        for j in small:  # numerical leftovers
            prob[j] = 1.0
        alias_prob[row, :deg] = prob
        alias_idx[row, :deg] = idx
    return alias_prob, alias_idx


def from_networkx(graph, max_degree: Optional[int] = None) -> PaddedGraph:
    """Build from a networkx graph whose nodes are 0..N-1 (or the reference's
    relabeled 2..N+1 space; both are accepted).

    Matches the reference artifact contract: `graph.gpickle` loaded and
    relabeled in reference pmgt/pmgt/trainer.py:34-43.
    """
    nodes = sorted(graph.nodes())
    n = len(nodes)
    offset = nodes[0] if nodes else 0
    if nodes != list(range(offset, offset + n)):
        raise ValueError("graph nodes must be a contiguous integer range")
    edges = [
        (u - offset, v - offset, data.get("weight", 1.0))
        for u, v, data in graph.edges(data=True)
    ]
    return from_edges(n, edges, max_degree=max_degree)
