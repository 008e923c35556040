"""MCN sampling and pair sampling: structural invariants and
distributional parity with the reference semantics
(pmgt/pmgt/datasets.py:14-53, 167-180)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmgt_tpu.core.config import SamplingConfig
from pmgt_tpu.graph.container import from_edges
from pmgt_tpu.sampling.mcn import sample_context
from pmgt_tpu.sampling.pairs import make_pretrain_batch, sample_pairs

CFG = SamplingConfig(hop_sampling_sizes=(4, 3, 2))


def test_context_shape_and_target_first(small_graph):
    targets = jnp.arange(2, 10, dtype=jnp.int32)
    ids, mask = jax.jit(
        lambda t, k: sample_context(small_graph, t, k, CFG)
    )(targets, jax.random.key(0))
    assert ids.shape == (8, 6)
    assert mask.shape == (8, 6)
    np.testing.assert_array_equal(np.asarray(ids[:, 0]), np.arange(2, 10))
    np.testing.assert_array_equal(np.asarray(mask[:, 0]), 1.0)


def test_context_excludes_target_and_specials(small_graph):
    targets = jnp.arange(2, 30, dtype=jnp.int32)
    ids, mask = sample_context(small_graph, targets, jax.random.key(1), CFG)
    ids = np.asarray(ids)
    mask = np.asarray(mask)
    for b in range(ids.shape[0]):
        ctx = ids[b, 1:][mask[b, 1:] > 0]
        assert ids[b, 0] not in ctx
        assert (ctx >= 2).all()
    # padding slots are id 0
    assert (ids[:, 1:][mask[:, 1:] == 0] == 0).all()


def test_context_mask_matches_scores():
    # Star graph: node 0 connected to 1 and 2 only, with a 2-node chain.
    g = from_edges(4, [(0, 1, 1.0), (0, 2, 1.0), (2, 3, 1.0)])
    targets = jnp.asarray([2], dtype=jnp.int32)  # node 0
    ids, mask = sample_context(g, targets, jax.random.key(0), CFG)
    # Reachable context from node 0: nodes 1, 2, 3 at most → ≤3 context
    assert np.asarray(mask)[0].sum() <= 4


def test_isolated_target_context():
    g = from_edges(3, [(0, 1, 1.0)])  # node 2 isolated
    ids, mask = sample_context(
        g, jnp.asarray([4], jnp.int32), jax.random.key(0), CFG
    )
    np.testing.assert_array_equal(
        np.asarray(mask)[0], [1.0, 0, 0, 0, 0, 0]
    )


def test_hop1_distribution_matches_edge_softmax():
    """With a single hop of many draws, neighbor visit frequencies must
    follow softmax(edge weights) — the reference's sampling distribution
    (datasets.py:27-32)."""
    w = np.array([0.1, 1.0, 2.0])
    g = from_edges(4, [(0, 1, w[0]), (0, 2, w[1]), (0, 3, w[2])])
    cfg = SamplingConfig(hop_sampling_sizes=(2000,), max_ctx_neigh=3)
    draws = []
    ids, mask = sample_context(
        g,
        jnp.full((64,), 2, jnp.int32),
        jax.random.key(42),
        cfg,
    )
    # Instead of raw draws, check empirical hop-1 frequencies via many
    # independent single-draw chains.
    cfg1 = SamplingConfig(hop_sampling_sizes=(1,), max_ctx_neigh=1)
    n = 6000
    ids, _ = sample_context(
        g, jnp.full((n,), 2, jnp.int32), jax.random.key(7), cfg1
    )
    ctx = np.asarray(ids[:, 1])
    counts = np.array([(ctx == 3).sum(), (ctx == 4).sum(), (ctx == 5).sum()])
    probs = counts / counts.sum()
    expected = np.exp(w) / np.exp(w).sum()
    np.testing.assert_allclose(probs, expected, atol=0.03)


def test_pair_sampling_training_invariants(small_graph):
    targets = jnp.arange(2, 34, dtype=jnp.int32)
    nodes, labels, valid = sample_pairs(
        small_graph, targets, jax.random.key(0), CFG, is_training=True
    )
    nodes, labels, valid = map(np.asarray, (nodes, labels, valid))
    assert nodes.shape == (32, 10)
    assert (valid == 1).all()  # training always fills all slots
    deg = np.asarray(small_graph.degrees)
    nbr = np.asarray(small_graph.nbr_ids)
    for b, t in enumerate(range(2, 34)):
        num_pos = min(5, deg[t])
        # labels: pos slots first
        np.testing.assert_array_equal(labels[b, :num_pos], 1.0)
        np.testing.assert_array_equal(labels[b, num_pos:], 0.0)
        nbr_set = set(nbr[t, : deg[t]].tolist())
        pos = nodes[b, :num_pos]
        assert set(pos.tolist()) <= nbr_set
        assert len(set(pos.tolist())) == num_pos  # without replacement
        negs = nodes[b, num_pos:]
        assert not (set(negs.tolist()) & nbr_set)  # rejection worked
        assert (negs >= 2).all()


def test_pair_sampling_eval(small_graph):
    targets = jnp.arange(2, 18, dtype=jnp.int32)
    nodes, labels, valid = sample_pairs(
        small_graph, targets, jax.random.key(3), CFG, is_training=False
    )
    assert nodes.shape == (16, 2)
    np.testing.assert_array_equal(np.asarray(labels)[:, 0], 1.0)
    np.testing.assert_array_equal(np.asarray(labels)[:, 1], 0.0)


def test_make_pretrain_batch_shapes(small_graph):
    batch = make_pretrain_batch(
        small_graph,
        jnp.arange(2, 10, dtype=jnp.int32),
        jax.random.key(0),
        CFG,
        is_training=True,
    )
    assert batch.target_ids.shape == (8, 6)
    assert batch.pair_ids.shape == (8, 10, 6)
    assert batch.pair_mask.shape == (8, 10, 6)
    assert batch.labels.shape == (8, 10)
    # each pair sequence leads with its own pair node
    pair_nodes = np.asarray(batch.pair_ids)[:, :, 0]
    assert (pair_nodes >= 2).all()


def test_sampling_is_deterministic_per_key(small_graph):
    targets = jnp.arange(2, 10, dtype=jnp.int32)
    a = sample_context(small_graph, targets, jax.random.key(5), CFG)
    b = sample_context(small_graph, targets, jax.random.key(5), CFG)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = sample_context(small_graph, targets, jax.random.key(6), CFG)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_packed_sort_bit_identical_to_variadic(small_graph):
    """The packed single-operand segment sort (default) must produce
    BIT-identical contexts to the stable variadic sort it replaced —
    the invariant that justified the swap (segment sums of exact
    small-integer f32 weights are order-invariant within a segment)."""
    from pmgt_tpu.sampling import mcn

    targets = jnp.arange(2, 34, dtype=jnp.int32)
    out = {}
    assert mcn.SORT_IMPL == "auto"
    try:
        for impl in ("packed", "variadic"):
            mcn.SORT_IMPL = impl
            out[impl] = jax.jit(
                lambda t, k: sample_context(small_graph, t, k, CFG)
            )(targets, jax.random.key(7))
    finally:
        mcn.SORT_IMPL = "auto"
    np.testing.assert_array_equal(
        np.asarray(out["packed"][0]), np.asarray(out["variadic"][0])
    )
    np.testing.assert_array_equal(
        np.asarray(out["packed"][1]), np.asarray(out["variadic"][1])
    )


def test_iterative_topk_bit_identical_to_xla(small_graph):
    """The iterated masked-argmax top-k (default for tiny k) must produce
    BIT-identical contexts to XLA's sort-based lax.top_k it replaced.
    The raw top_k outputs may differ on rows whose tail entries are all
    -inf (see _topk_scores docstring), but the caller-visible contexts
    (ids + mask) must agree exactly — including rows with fewer than
    max_ctx_neigh scored segments, which the sparse small_graph
    provides."""
    from pmgt_tpu.sampling import mcn

    targets = jnp.arange(2, 34, dtype=jnp.int32)
    out = {}
    assert mcn.TOPK_IMPL == "auto"
    try:
        for impl in ("iterative", "xla"):
            mcn.TOPK_IMPL = impl
            out[impl] = jax.jit(
                lambda t, k: sample_context(small_graph, t, k, CFG)
            )(targets, jax.random.key(7))
    finally:
        mcn.TOPK_IMPL = "auto"
    np.testing.assert_array_equal(
        np.asarray(out["iterative"][0]), np.asarray(out["xla"][0])
    )
    np.testing.assert_array_equal(
        np.asarray(out["iterative"][1]), np.asarray(out["xla"][1])
    )


def test_draw_paths_bit_identical(small_graph):
    """All three row-draw layouts must produce BIT-identical contexts:
    the narrow 16-bit-id table (draw_packed16, production default on
    graphs whose ids fit 16 bits), the wide fused table (draw_packed),
    and the legacy three-gather split path — the draw math reads the
    exact same numbers (ids, alias ids, f32 prob bits, degree) from
    different memory layouts."""
    from pmgt_tpu.graph import container
    from pmgt_tpu.sampling import mcn

    # Rebuild the fixture graph (edges recovered from its rows; weights
    # are stored raw in nbr_logits) with every table variant materialized.
    edges = []
    for row in range(2, small_graph.num_total):
        deg = int(small_graph.degrees[row])
        for v, w in zip(
            small_graph.nbr_ids[row][:deg].tolist(),
            small_graph.nbr_logits[row][:deg].tolist(),
        ):
            if row < v:
                edges.append((row - 2, int(v) - 2, float(w)))
    assert not container.KEEP_SPLIT_TABLES
    assert not container.KEEP_WIDE_PACKED
    try:
        container.KEEP_SPLIT_TABLES = True
        container.KEEP_WIDE_PACKED = True
        every = container.from_edges(small_graph.num_nodes, edges)
    finally:
        container.KEEP_SPLIT_TABLES = False
        container.KEEP_WIDE_PACKED = False
    assert every.draw_packed16.shape[0] > 1
    assert every.draw_packed.shape[0] > 1
    assert every.draw_ids.shape[0] > 1

    targets = jnp.arange(2, 34, dtype=jnp.int32)
    out = {}
    assert mcn.DRAW_IMPL == "auto"
    try:
        for impl in ("packed16", "packed", "split"):
            mcn.DRAW_IMPL = impl
            out[impl] = jax.jit(
                lambda t, k: sample_context(every, t, k, CFG)
            )(targets, jax.random.key(9))
    finally:
        mcn.DRAW_IMPL = "auto"
    for other in ("packed", "split"):
        np.testing.assert_array_equal(
            np.asarray(out["packed16"][0]), np.asarray(out[other][0])
        )
        np.testing.assert_array_equal(
            np.asarray(out["packed16"][1]), np.asarray(out[other][1])
        )


def test_draw_impl_resolution(small_graph):
    """auto → packed16 (small-id production graphs materialize only the
    narrow table); forcing a path whose table is a placeholder must fail
    loudly — a silent fallback would corrupt draw-path A/Bs."""
    from pmgt_tpu.sampling import mcn

    assert mcn._draw_path(small_graph) == "packed16"  # auto
    try:
        mcn.DRAW_IMPL = "packed16"
        assert mcn._draw_path(small_graph) == "packed16"
        for forced in ("packed", "split"):
            mcn.DRAW_IMPL = forced
            with pytest.raises(ValueError, match="placeholder"):
                mcn._draw_path(small_graph)
    finally:
        mcn.DRAW_IMPL = "auto"


def test_forced_row_impl_raises_on_large_degree_graph():
    """A forced row DRAW_IMPL on a large-degree graph (flat tables only)
    must raise, not silently fall back to 'flat' — otherwise BOTH sides
    of a draw-path A/B time the flat path and report 'no difference'
    (the _alias_draw call site used to bypass _draw_path's check with
    its own max-degree guard)."""
    from pmgt_tpu.graph.container import ROW_DRAW_MAX_DEG
    from pmgt_tpu.sampling import mcn

    d = ROW_DRAW_MAX_DEG + 6
    g = from_edges(d + 1, [(0, j, 1.0) for j in range(1, d + 1)])
    assert mcn._draw_path(g) == "flat"  # auto resolves fine
    try:
        mcn.DRAW_IMPL = "packed16"
        with pytest.raises(ValueError, match="placeholder"):
            mcn._alias_draw(
                g,
                jnp.zeros((2, 2), jnp.int32),
                3,
                jax.random.key(0),
            )
    finally:
        mcn.DRAW_IMPL = "auto"


def test_sample_pairs_on_graph_sparser_than_max_pos():
    """Graphs whose padded max degree is below max_pos (chains, stars —
    from_edges only guarantees max_deg >= 1) must sample pairs instead
    of crashing at trace time (lax.top_k requires k <= row width).
    Positive slots beyond the stored neighbors stay masked."""
    g = from_edges(6, [(i, i + 1, 1.0) for i in range(5)])  # chain
    cfg = SamplingConfig(
        max_ctx_neigh=3, hop_sampling_sizes=(3, 2),
        max_total_samples=10, min_neg_samples=5,  # max_pos=5 > max_deg=2
        num_total=g.num_total,
    )
    assert g.nbr_ids.shape[1] < 5
    # interior chain nodes (real 1,2,3 -> shifted ids 3,4,5)
    targets = jnp.asarray([3, 4, 5], jnp.int32)
    nodes, labels, valid = sample_pairs(
        g, targets, jax.random.key(0), cfg, is_training=True
    )
    nodes, labels, valid = map(np.asarray, (nodes, labels, valid))
    assert nodes.shape == (3, 10)
    # interior chain nodes have exactly 2 neighbors -> 2 positives
    assert (labels.sum(axis=1) == 2).all()
    assert (valid == 1.0).all()  # complement is non-empty everywhere
    # the positives are the true neighbors (ids share the +2 shift)
    for r, t in enumerate([3, 4, 5]):
        pos = set(nodes[r][labels[r] == 1].tolist())
        assert pos == {t - 1, t + 1}
    # eval branch compiles too
    sample_pairs(g, targets, jax.random.key(1), cfg, is_training=False)


def test_sample_all_contexts_honors_small_chunk():
    """A caller-computed memory-pressure chunk below REFRESH_CHUNK must
    actually chunk mid-size graphs (the gate used to compare against the
    constant, silently materializing the full single-shot transient the
    caller's HBM budget ruled out)."""
    from pmgt_tpu.sampling.pairs import sample_all_contexts

    g = from_edges(50, [(i, (i + 7) % 50, 1.0) for i in range(50)])
    cfg = SamplingConfig(
        max_ctx_neigh=3, hop_sampling_sizes=(3, 2),
        max_total_samples=4, min_neg_samples=2, num_total=g.num_total,
    )
    n = g.num_total
    ids, mask = sample_all_contexts(
        g, jax.random.key(0), cfg, n, chunk=16
    )
    ids, mask = np.asarray(ids), np.asarray(mask)
    assert ids.shape[0] == n and mask.shape[0] == n
    # special rows stay context-free, real rows keep their target id
    assert (mask[:2, 1:] == 0).all()
    assert (ids[2:, 0] == np.arange(2, n)).all()


def test_sort_impl_resolution():
    """auto → packed iff the int32 packing fits; forced 'packed' that
    cannot pack must fail loudly — a silent variadic fallback would
    corrupt packed-vs-variadic A/Bs (both sides timing the same code)."""
    from pmgt_tpu.sampling import mcn

    assert mcn._use_packed_sort(10_836, 2)
    assert not mcn._use_packed_sort(2**30, 2)  # > ~268M nodes at depth 3
    try:
        mcn.SORT_IMPL = "variadic"
        assert not mcn._use_packed_sort(10_836, 2)
        mcn.SORT_IMPL = "packed"
        assert mcn._use_packed_sort(10_836, 2)
        with pytest.raises(ValueError, match="packed"):
            mcn._use_packed_sort(2**30, 2)
    finally:
        mcn.SORT_IMPL = "auto"


def test_score_ordering_prefers_close_frequent_nodes():
    """Direct neighbors sampled every hop must outrank distant nodes —
    the freq × (depth - k + 1) scoring property (datasets.py:35-40)."""
    # Path graph 0-1-2-3-4: context of node 0 should rank 1 first.
    g = from_edges(5, [(i, i + 1, 1.0) for i in range(4)])
    cfg = SamplingConfig(hop_sampling_sizes=(8, 4, 2), max_ctx_neigh=4)
    ids, mask = sample_context(
        g, jnp.full((32,), 2, jnp.int32), jax.random.key(0), cfg
    )
    first_ctx = np.asarray(ids)[:, 1]
    # node 1 (row 3) must be the top-scored context nearly always
    assert (first_ctx == 3).mean() > 0.9


def test_negatives_on_dense_graph():
    """A target adjacent to every node but one: the complement rank-select
    must return that one true non-neighbor every time (a sampler that can
    emit positives as negatives fails here)."""
    from pmgt_tpu.graph.container import NUM_SPECIAL_NODES

    n = 40
    # node 0 adjacent to every node except node 1
    edges = [(0, v, 1.0) for v in range(2, n)] + [(1, 2, 1.0)]
    g = from_edges(n, edges)
    cfg = SamplingConfig()
    target_id = 0 + NUM_SPECIAL_NODES
    targets = jnp.full((64,), target_id, jnp.int32)
    fn = jax.jit(lambda g, t, k: sample_pairs(g, t, k, cfg, True))
    legal = {target_id, 1 + NUM_SPECIAL_NODES}  # itself + the non-neighbor
    for seed in range(4):
        nodes, labels, valid = fn(g, targets, jax.random.key(seed))
        nodes, labels, valid = map(np.asarray, (nodes, labels, valid))
        assert valid.all()
        negs = nodes[labels == 0.0]
        assert set(negs.tolist()) <= legal, set(negs.tolist()) - legal


def test_chunked_refresh_structural_invariants(small_graph, monkeypatch):
    """The >REFRESH_CHUNK whole-graph refresh path (lax.map over node
    chunks, sampling/pairs.py) is normally only reachable at 10^5+ nodes;
    force it small and assert it produces the same structural contract as
    the single-shot path: target-first rows, valid context ids, special
    rows context-free, deterministic per key."""
    from pmgt_tpu.sampling import pairs as pairs_mod
    from pmgt_tpu.sampling.pairs import sample_all_contexts

    n_total = small_graph.num_total  # 52: forces 4 chunks of 16
    monkeypatch.setattr(pairs_mod, "REFRESH_CHUNK", 16)
    ids, mask = jax.jit(
        lambda k: sample_all_contexts(small_graph, k, CFG, n_total)
    )(jax.random.key(3))
    assert ids.shape == (n_total, 6) and mask.shape == (n_total, 6)
    ids_np, mask_np = np.asarray(ids), np.asarray(mask)
    # Row i's target slot is node i; specials are context-free.
    np.testing.assert_array_equal(ids_np[:, 0], np.arange(n_total))
    np.testing.assert_array_equal(mask_np[:2, 1:], 0.0)
    np.testing.assert_array_equal(ids_np[:2, 1:], 0)
    # Context slots: padding is id 0, real context ids are >= 2.
    assert (ids_np[:, 1:][mask_np[:, 1:] == 0] == 0).all()
    assert (ids_np[:, 1:][mask_np[:, 1:] > 0] >= 2).all()
    # Deterministic per key; the chunk split changes the stream shape but
    # not determinism.
    ids2, _ = sample_all_contexts(
        small_graph, jax.random.key(3), CFG, n_total
    )
    np.testing.assert_array_equal(ids_np, np.asarray(ids2))


def test_chunked_pair_tables_non_dividing_chunk(small_graph):
    """sample_all_pairs with a chunk size that does not divide N: the
    lax.map pad rows must not leak into real rows, positives must be true
    neighbors, negatives true non-neighbors, specials masked invalid."""
    from pmgt_tpu.graph.container import NUM_SPECIAL_NODES
    from pmgt_tpu.sampling.pairs import sample_all_pairs

    n_total = small_graph.num_total
    cfg = SamplingConfig()
    nodes, labels, valid = jax.jit(
        lambda k: sample_all_pairs(
            small_graph, k, cfg, n_total, True, chunk_size=7
        )
    )(jax.random.key(11))
    nodes, labels, valid = map(np.asarray, (nodes, labels, valid))
    assert nodes.shape[0] == n_total
    assert (valid[:NUM_SPECIAL_NODES] == 0).all()
    nbr = np.asarray(small_graph.nbr_ids)
    deg = np.asarray(small_graph.degrees)
    for t in range(NUM_SPECIAL_NODES, n_total):
        neigh = set(nbr[t, : deg[t]].tolist())
        sel = valid[t] > 0
        pos = nodes[t][(labels[t] == 1.0) & sel]
        neg = nodes[t][(labels[t] == 0.0) & sel]
        assert set(pos.tolist()) <= neigh, t
        # Negatives are the complement of the NEIGHBOR set only — the
        # target itself is a legal negative, exactly like the reference's
        # rejection loop (`candidate in self.graph[target]` is False for
        # the target absent a self-loop, reference datasets.py:173-180).
        assert not (set(neg.tolist()) & neigh), t


def test_runtime_view_sampling_bit_identical(small_graph):
    """Production sampling must not read the build-only arrays that
    runtime_view drops (nbr_logits / alias_prob / alias_idx) — tasks
    place only the trimmed view on device, so any new consumer of a
    trimmed field would gather from a 1x1 placeholder and corrupt
    training silently. Bit-identical outputs prove independence."""
    trimmed = small_graph.runtime_view()
    assert trimmed.nbr_logits.shape == (1, 1)
    assert trimmed.alias_prob.shape == (1, 1)
    assert trimmed.alias_idx.shape == (1, 1)
    targets = jnp.arange(2, 34, dtype=jnp.int32)
    key = jax.random.key(13)
    full_ctx = sample_context(small_graph, targets, key, CFG)
    trim_ctx = sample_context(trimmed, targets, key, CFG)
    for a, b in zip(full_ctx, trim_ctx):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    full_pairs = sample_pairs(small_graph, targets, key, CFG, True)
    trim_pairs = sample_pairs(trimmed, targets, key, CFG, True)
    for a, b in zip(full_pairs, trim_pairs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_effective_refresh_chunk_memory_pressure(small_graph):
    """The chunked refresh keeps the full 65,536 node chunk (chunk
    latency dominates: halving it measured ~1.9x slower at 100k nodes)
    unless the caller's free-HBM estimate can't hold the hop-gather
    transient plus its relayout copy (2 * chunk * prod(hops[:-1]) *
    draw_row_lanes * 4 bytes) — the 2.5M-node OOM case."""
    from pmgt_tpu.sampling import pairs as pairs_mod
    from pmgt_tpu.sampling.mcn import _draw_path

    # no pressure information -> full chunk, always
    assert (
        pairs_mod.effective_refresh_chunk(small_graph, CFG)
        == pairs_mod.REFRESH_CHUNK
    )

    lanes = {
        "packed16": small_graph.draw_packed16.shape[-1],
        "packed": small_graph.draw_packed.shape[-1],
        "split": 3 * small_graph.nbr_ids.shape[-1],
    }[_draw_path(small_graph)]
    wavefront = 1
    for h in CFG.hop_sampling_sizes[:-1]:
        wavefront *= h
    full = 2 * pairs_mod.REFRESH_CHUNK * wavefront * lanes * 4
    # plenty of room -> full chunk
    assert (
        pairs_mod.effective_refresh_chunk(small_graph, CFG, full)
        == pairs_mod.REFRESH_CHUNK
    )
    # room for exactly a quarter-chunk transient -> quarter chunk
    assert (
        pairs_mod.effective_refresh_chunk(small_graph, CFG, full // 4)
        == pairs_mod.REFRESH_CHUNK // 4
    )
    # floor: never below 8192 regardless of pressure
    assert pairs_mod.effective_refresh_chunk(small_graph, CFG, 0) == 8192


def test_effective_refresh_chunk_flat_draw_path():
    """Large-degree graphs (max_deg > ROW_DRAW_MAX_DEG, e.g. the
    published co-review graphs' 288 cap) materialize FLAT draw tables;
    effective_refresh_chunk must budget that path instead of raising
    (round-4 regression: PMGTTask init crashed on every published-shape
    dataset whenever the free-HBM estimate was supplied)."""
    from pmgt_tpu.graph.container import ROW_DRAW_MAX_DEG
    from pmgt_tpu.sampling import pairs as pairs_mod
    from pmgt_tpu.sampling.mcn import _draw_path

    d = ROW_DRAW_MAX_DEG + 6
    edges = [(0, j, 1.0) for j in range(1, d + 1)]
    g = from_edges(d + 1, edges)
    assert g.max_degree > ROW_DRAW_MAX_DEG
    assert _draw_path(g) == "flat"
    # row tables are placeholders on this graph
    assert g.draw_packed16.shape[0] == 1 and g.draw_packed.shape[0] == 1

    # no pressure -> full chunk; pressure -> shrinks, never raises
    assert (
        pairs_mod.effective_refresh_chunk(g, CFG)
        == pairs_mod.REFRESH_CHUNK
    )
    lanes = 3 * CFG.hop_sampling_sizes[-1]
    wavefront = 1
    for h in CFG.hop_sampling_sizes[:-1]:
        wavefront *= h
    full = 2 * pairs_mod.REFRESH_CHUNK * wavefront * lanes * 4
    assert pairs_mod.effective_refresh_chunk(g, CFG, full) == (
        pairs_mod.REFRESH_CHUNK
    )
    assert pairs_mod.effective_refresh_chunk(g, CFG, full // 2) == (
        pairs_mod.REFRESH_CHUNK // 2
    )
    assert pairs_mod.effective_refresh_chunk(g, CFG, 0) == 8192
