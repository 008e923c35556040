"""Clustered synthetic datasets for tests, benchmarks, and the quality
pipeline.

The reference has no synthetic data — its only datasets are the Amazon
dumps, which need network access. This generator produces data with the
same *learnable structure* the real datasets have, so the full pipeline
(PMGT pretrain → embedding export → NCF/DCN fine-tune) demonstrates real
metric lifts end to end (tools/validate_pipeline.py):

- items belong to latent clusters; the co-purchase graph is mostly
  intra-cluster (ring backbone + preferential random edges), mirroring
  the community structure of co-review graphs (notebook cell 20);
- multimodal features are cluster centroids plus noise, so node features
  predict graph structure (what NFR/GSR exploit);
- each user has a preferred cluster and interacts mostly inside it, so
  item-item graph proximity predicts interactions (what PMGT-injected
  downstream models exploit).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from pmgt_tpu.data.artifacts import DatasetArtifacts
from pmgt_tpu.graph.container import NUM_SPECIAL_NODES, from_edges

# Exact node/user/edge/interaction counts of the two published datasets
# (reference README.md:129-167; SURVEY §6). `make_published_shape_dataset`
# generates synthetic data at these shapes with power-law degree and
# activity distributions — the closest fidelity proxy available without
# network access to the real Amazon dumps.
PUBLISHED_SHAPES = {
    "VG": dict(
        num_nodes=7252, num_users=27988,
        num_edges=88606, num_interactions=98278,
    ),
    "TG": dict(
        num_nodes=10834, num_users=134697,
        num_edges=38252, num_interactions=378138,
    ),
}


def _fast_edges(num_nodes, target_edges, cluster, members, rng):
    """Vectorized equivalent of the per-edge loop: intra-cluster ring
    backbone (weight 1.0) + random edges, 85% biased to the source
    node's cluster, weight 0.5 + Exp(0.7). Different RNG stream than
    the loop (batched draws), same distribution."""
    edge_u, edge_v, edge_w = [], [], []
    for mem in members:
        if len(mem) < 2:
            continue
        order = rng.permutation(mem)
        edge_u.append(order)
        edge_v.append(np.roll(order, -1))
        edge_w.append(np.ones(len(order), np.float64))

    # Padded members matrix for vectorized "random member of cluster".
    c = len(members)
    max_size = max(len(m) for m in members) if members else 1
    mem_mat = np.zeros((c, max_size), np.int64)
    sizes = np.zeros(c, np.int64)
    for k, m in enumerate(members):
        mem_mat[k, : len(m)] = m
        sizes[k] = len(m)

    need = target_edges - sum(len(u) for u in edge_u)
    draw = max(int(need * 1.5), 1024)
    for _ in range(8):  # oversample until the dedupe keeps enough
        u = rng.integers(num_nodes, size=draw)
        cu = cluster[u]
        intra = (rng.random(draw) < 0.85) & (sizes[cu] > 1)
        v_rand = rng.integers(num_nodes, size=draw)
        slot = (rng.random(draw) * sizes[cu]).astype(np.int64)
        v = np.where(intra, mem_mat[cu, slot], v_rand)
        w = 0.5 + rng.exponential(0.7, size=draw)
        keep = u != v
        edge_u.append(u[keep])
        edge_v.append(v[keep])
        edge_w.append(w[keep])
        # dedupe on the undirected key, first occurrence wins
        uu = np.concatenate(edge_u)
        vv = np.concatenate(edge_v)
        ww = np.concatenate(edge_w)
        key = np.minimum(uu, vv) * np.int64(num_nodes) + np.maximum(uu, vv)
        _, first = np.unique(key, return_index=True)
        first.sort()
        edge_u, edge_v, edge_w = [uu[first]], [vv[first]], [ww[first]]
        if len(first) >= target_edges:
            break
    uu, vv, ww = edge_u[0], edge_v[0], edge_w[0]
    if len(uu) > target_edges:
        uu, vv, ww = uu[:target_edges], vv[:target_edges], ww[:target_edges]
    return [(int(a), int(b), float(w)) for a, b, w in zip(uu, vv, ww)]


def make_synthetic_dataset(
    num_nodes: int,
    num_users: int,
    feat_dims: Sequence[int] = (1536, 768),
    avg_degree: int = 16,
    interactions_per_user: int = 12,
    num_clusters: Optional[int] = None,
    seed: int = 0,
) -> DatasetArtifacts:
    """Generate a clustered dataset in the in-memory artifact format.

    Items double as graph nodes (``num_items == num_nodes``;
    ``item_classes``/``node_classes`` are None so downstream id remapping
    is the identity, matching reference datasets where every interaction
    item is in the graph).
    """
    rng = np.random.default_rng(seed)
    c = num_clusters or max(2, min(40, num_nodes // 8))
    c = min(c, num_nodes)
    # Balanced cluster assignment.
    cluster = rng.permutation(np.arange(num_nodes) % c).astype(np.int32)
    members = [np.flatnonzero(cluster == k) for k in range(c)]

    # --- graph: intra-cluster ring backbone + biased random edges -------
    # Same distribution two ways: the per-edge Python loop below (kept
    # verbatim so every existing seed reproduces its exact graph) and a
    # vectorized path for large graphs (the loop measured ~17 min at
    # 100k nodes; the vectorized path is seconds). All tests and benches
    # run < 20k nodes, so their streams are untouched.
    target_edges = max(num_nodes * avg_degree // 2, num_nodes)
    if num_nodes >= 20_000:
        edges = _fast_edges(
            num_nodes, target_edges, cluster, members, rng
        )
    else:
        edges = []
        seen = set()

        def add_edge(u: int, v: int, w: float) -> None:
            if u == v:
                return
            k = (min(u, v), max(u, v))
            if k in seen:
                return
            seen.add(k)
            edges.append((int(u), int(v), float(w)))

        for mem in members:
            if len(mem) < 2:
                continue
            order = rng.permutation(mem)
            for i in range(len(order)):
                add_edge(order[i], order[(i + 1) % len(order)], 1.0)

        attempts = 0
        while len(edges) < target_edges and attempts < 20 * target_edges:
            attempts += 1
            u = int(rng.integers(num_nodes))
            if rng.random() < 0.85 and len(members[cluster[u]]) > 1:
                v = int(rng.choice(members[cluster[u]]))
            else:
                v = int(rng.integers(num_nodes))
            # Weight shaped like the notebook's log-normalized co-review
            # counts: O(1) with a heavy-ish tail.
            add_edge(u, v, 0.5 + rng.exponential(0.7))
    graph = from_edges(num_nodes, edges)

    # --- features: cluster centroid + noise, rows 0/1 zeroed ------------
    feat_tables = []
    for dim in feat_dims:
        centroids = rng.normal(size=(c, dim)).astype(np.float32)
        table = np.zeros((num_nodes + NUM_SPECIAL_NODES, dim), np.float32)
        noise = rng.normal(size=(num_nodes, dim)).astype(np.float32)
        table[NUM_SPECIAL_NODES:] = centroids[cluster] + 0.4 * noise
        feat_tables.append(table)

    # --- interactions: cluster-preferring users, 80/20 split ------------
    k = min(interactions_per_user, num_nodes)
    pref = rng.integers(0, c, size=num_users)
    train_list, test_list = [], []
    all_items = np.arange(num_nodes)
    for u in range(num_users):
        own = members[pref[u]]
        n_own = min(int(round(k * 0.8)), len(own))
        chosen = set(
            rng.choice(own, size=n_own, replace=False).tolist()
        ) if n_own else set()
        while len(chosen) < k:
            chosen.add(int(rng.choice(all_items)))
        items = rng.permutation(np.asarray(sorted(chosen), np.int64))
        n_test = max(1, int(round(len(items) * 0.2))) if len(items) > 1 else 0
        for it in items[: len(items) - n_test]:
            train_list.append((u, int(it)))
        for it in items[len(items) - n_test :]:
            test_list.append((u, int(it)))

    return DatasetArtifacts(
        graph=graph,
        feat_init_embs=feat_tables,
        train_pairs=np.asarray(train_list, np.int32).reshape(-1, 2),
        test_pairs=np.asarray(test_list, np.int32).reshape(-1, 2),
        num_users=num_users,
        num_items=num_nodes,
    )


# --------------------------------------------------------------------------
# Published-shape generation: power-law degrees/popularity/activity at the
# exact counts of the real VG/TG datasets.
# --------------------------------------------------------------------------


def _popularity(num_nodes, rng, gamma: float = 2.1, offset: float = 10.0):
    """Zipf-like popularity weights (power-law tail with exponent
    ``gamma``), randomly permuted so popularity is independent of
    cluster assignment. Popularity drives BOTH graph degree and
    interaction frequency — in real co-review data the two are coupled
    by construction (edges come from co-reviews)."""
    ranks = rng.permutation(num_nodes).astype(np.float64)
    w = (ranks + offset) ** (-1.0 / (gamma - 1.0))
    return w / w.sum()


def _cluster_samplers(members, pop):
    """Per-cluster cumulative popularity tables for vectorized
    popularity-weighted draws within a cluster."""
    c = len(members)
    max_size = max(len(m) for m in members)
    mem_mat = np.zeros((c, max_size), np.int64)
    cum = np.ones((c, max_size), np.float64)  # pad with 1.0 (never chosen)
    for k, m in enumerate(members):
        mem_mat[k, : len(m)] = m
        p = pop[m]
        cum[k, : len(m)] = np.cumsum(p) / p.sum()
    return mem_mat, cum


def _draw_in_cluster(cids, mem_mat, cum, rng):
    """For each cluster id in ``cids`` draw one member ∝ popularity."""
    u = rng.random(len(cids))[:, None]
    slot = np.argmax(cum[cids] >= u, axis=1)
    return mem_mat[cids, slot]


def _co_review_weights(n, rng):
    """Heavy-tailed co-review counts → log weights, the notebook's
    log-normalized edge-weight shape (cell 20): most pairs co-reviewed
    once, a long tail of frequently co-bought pairs."""
    counts = 1.0 + np.floor(rng.pareto(1.5, size=n))
    return 1.0 + np.log(np.minimum(counts, 50.0))


def _powerlaw_edges(num_nodes, num_edges, cluster, members, pop, rng):
    """Chung–Lu-style edge sampling with cluster bias: endpoints drawn ∝
    popularity, 85% of partners from the source's cluster. A one-edge
    backbone per node (popularity-weighted same-cluster partner) keeps
    min degree ≥ 1, as in real co-review graphs."""
    mem_mat, cum = _cluster_samplers(members, pop)
    gcum = np.cumsum(pop)
    gcum /= gcum[-1]

    srcs = np.arange(num_nodes)
    multi = np.asarray([len(members[cluster[u]]) > 1 for u in srcs])
    backbone_v = np.where(
        multi, _draw_in_cluster(cluster[srcs], mem_mat, cum, rng),
        (srcs + 1) % num_nodes,
    )
    # A node that drew itself would lose its backbone edge to self-loop
    # removal and could end up isolated (real co-review graphs have min
    # degree 1): pair it with the next member of its cluster instead.
    self_draw = backbone_v == srcs
    if self_draw.any():
        sizes = np.asarray([len(m) for m in members])
        pos_in_cluster = np.empty(num_nodes, np.int64)
        for m in members:
            pos_in_cluster[m] = np.arange(len(m))
        nxt = (pos_in_cluster + 1) % np.maximum(sizes[cluster], 1)
        backbone_v = np.where(
            self_draw & multi, mem_mat[cluster[srcs], nxt], backbone_v
        )
    edge_u, edge_v = [srcs], [backbone_v]

    for _ in range(12):
        uu = np.concatenate(edge_u)
        vv = np.concatenate(edge_v)
        key = np.minimum(uu, vv) * np.int64(num_nodes) + np.maximum(uu, vv)
        keep = uu != vv
        _, first = np.unique(key[keep], return_index=True)
        first.sort()
        edge_u, edge_v = [uu[keep][first]], [vv[keep][first]]
        short = num_edges - len(first)
        if short <= 0:
            break
        draw = max(int(short * 1.6), 1024)
        u = np.searchsorted(gcum, rng.random(draw))
        intra = rng.random(draw) < 0.85
        v = np.where(
            intra,
            _draw_in_cluster(cluster[u], mem_mat, cum, rng),
            np.searchsorted(gcum, rng.random(draw)),
        )
        edge_u.append(u)
        edge_v.append(v)
    uu, vv = edge_u[0][:num_edges], edge_v[0][:num_edges]
    ww = _co_review_weights(len(uu), rng)
    return [(int(a), int(b), float(w)) for a, b, w in zip(uu, vv, ww)]


def _powerlaw_interactions(
    num_users, num_items, total, cluster, members, pop, rng,
    alpha: float = 2.3, intra_prob: float = 0.8,
):
    """(user, item) pairs: per-user activity is discrete-Pareto
    distributed (mean repaired to ``total/num_users``), each user
    prefers one cluster (``intra_prob`` of draws) and picks items ∝
    popularity. Unique per (user, item); trimmed to exactly ``total``."""
    mem_mat, cum = _cluster_samplers(members, pop)
    gcum = np.cumsum(pop)
    gcum /= gcum[-1]
    pref = rng.integers(0, len(members), size=num_users)

    sizes = np.floor(
        (1.0 - rng.random(num_users)) ** (-1.0 / (alpha - 1.0))
    ).astype(np.int64)
    sizes = np.minimum(sizes, 10 * max(total // num_users, 1))

    pairs = np.empty((0, 2), np.int64)
    for _ in range(12):
        short = total - len(pairs)
        if short <= 0:
            break
        # Scale activity so this round's draw covers the deficit.
        scale = max(float(short) * 1.3 / max(sizes.sum(), 1), 1e-9)
        counts = rng.poisson(sizes * scale)
        users = np.repeat(np.arange(num_users), counts)
        n = len(users)
        if n == 0:
            continue
        intra = rng.random(n) < intra_prob
        items = np.where(
            intra,
            _draw_in_cluster(pref[users], mem_mat, cum, rng),
            np.searchsorted(gcum, rng.random(n)),
        )
        new = np.stack([users, items], axis=1)
        pairs = np.concatenate([pairs, new])
        key = pairs[:, 0] * np.int64(num_items) + pairs[:, 1]
        _, first = np.unique(key, return_index=True)
        first.sort()
        pairs = pairs[first]
    return pairs[:total]


# The quality gate's calibrated per-shape ``signal`` operating point —
# swept on the TPU so the synthetic plain-vs-PMGT lifts land at the
# PUBLISHED magnitudes (VG 0.6 → NeuMF N@20 +15.5% vs published +13.9%;
# TG 0.5 → +8.05% vs +8.9%; full sweep table in ROADMAP.md, round 4).
# SINGLE SOURCE OF TRUTH: validate_pipeline / dcn_sensitivity /
# neumf_pre_bisect / hpo_pmgt_study all import this — recalibrate here.
CALIBRATED_SIGNAL = {"VG": 0.6, "TG": 0.5}


def make_published_shape_dataset(
    shape: str,
    feat_dims: Sequence[int] = (1536, 768),
    num_clusters: int = 40,
    seed: int = 0,
    signal: float = 1.0,
) -> DatasetArtifacts:
    """Synthetic dataset at the EXACT published scale and sparsity of VG
    or TG (reference README.md:129-167): node/user/edge/interaction
    counts, power-law degree distribution (co-purchase graphs are
    scale-free), power-law per-user activity (TG: mean 2.8
    interactions/user), popularity coupled between graph degree and
    interaction frequency, cluster community structure, nonnegative
    visual features (Inception-v4 avg-pool is post-ReLU), and the
    reference's global random 80/20 interaction split
    (preprocess.py / notebook cell 24). The closest operating-point
    fidelity check available without network access to the Amazon dumps
    (tools/validate_pipeline.py --shape VG|TG).

    ``signal`` scales how strongly graph structure predicts interactions
    — the intra-cluster interaction preference becomes
    ``0.8 * signal`` (VERDICT r3 #4: at signal 1.0 the plain-vs-PMGT
    downstream lifts run 2-4x the published magnitudes, so a fidelity
    bug could hide inside the exaggerated margin; the calibrated
    per-shape values in tools/validate_pipeline.py land the lifts near
    the published ones). The knob only affects the interaction draws —
    the rng stream for clusters/popularity/edges/features is consumed
    before it, so the graph, features, and therefore PMGT pretraining
    and its exported embeddings are IDENTICAL across signal values for
    a fixed seed (calibration sweeps reuse one pretrain)."""
    spec = PUBLISHED_SHAPES[shape.upper()]
    num_nodes, num_users = spec["num_nodes"], spec["num_users"]
    rng = np.random.default_rng(seed)

    c = min(num_clusters, num_nodes)
    cluster = rng.permutation(np.arange(num_nodes) % c).astype(np.int32)
    members = [np.flatnonzero(cluster == k) for k in range(c)]
    pop = _popularity(num_nodes, rng)

    edges = _powerlaw_edges(
        num_nodes, spec["num_edges"], cluster, members, pop, rng
    )
    graph = from_edges(num_nodes, edges)

    feat_tables = []
    for i, dim in enumerate(feat_dims):
        centroids = rng.normal(size=(c, dim)).astype(np.float32)
        table = np.zeros((num_nodes + NUM_SPECIAL_NODES, dim), np.float32)
        noise = rng.normal(size=(num_nodes, dim)).astype(np.float32)
        rows = centroids[cluster] + 0.4 * noise
        if i == 0:  # visual: Inception-v4 avg-pool activations are ≥ 0
            rows = np.maximum(rows, 0.0)
        table[NUM_SPECIAL_NODES:] = rows
        feat_tables.append(table)

    pairs = _powerlaw_interactions(
        num_users, num_nodes, spec["num_interactions"],
        cluster, members, pop, rng, intra_prob=0.8 * signal,
    )
    perm = rng.permutation(len(pairs))
    n_test = int(round(len(pairs) * 0.2))
    test_idx, train_idx = perm[:n_test], perm[n_test:]

    return DatasetArtifacts(
        graph=graph,
        feat_init_embs=feat_tables,
        train_pairs=pairs[train_idx].astype(np.int32),
        test_pairs=pairs[test_idx].astype(np.int32),
        num_users=num_users,
        num_items=num_nodes,
    )
