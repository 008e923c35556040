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
