"""Data layer tests: interaction tables, negative sampling, eval candidate
protocol, artifact formats (native + reference), preprocessing."""
import os

import jax
import numpy as np
import pytest

from pmgt_tpu.data.artifacts import (
    DatasetArtifacts,
    load_artifacts,
    load_node_init_emb,
    save_native,
)
from pmgt_tpu.data.interactions import (
    InteractionData,
    build_eval_candidates,
    epoch_training_arrays,
)
from pmgt_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def inter():
    pairs = np.array(
        [[0, 1], [0, 2], [1, 0], [1, 3], [1, 4], [2, 2]], np.int32
    )
    return InteractionData.build(pairs, num_users=3, num_items=6)


def test_build_padded_table(inter):
    assert inter.user_pos.shape == (3, 3)
    np.testing.assert_array_equal(inter.unique_users, [0, 1, 2])
    np.testing.assert_array_equal(inter.user_pos_count, [2, 3, 1])
    np.testing.assert_array_equal(inter.user_pos[0], [1, 2, 6])  # pad=num_items
    np.testing.assert_array_equal(inter.user_pos[1], [0, 3, 4])


def test_epoch_training_arrays_negatives_avoid_positives(inter):
    users, items, labels = epoch_training_arrays(inter, 2, jax.random.key(0))
    assert len(users) == 6 * 3  # 1 pos + 2 neg per pair
    pos_set = {(int(u), int(i)) for u, i in inter.pairs}
    for u, i, l in zip(users, items, labels):
        if l == 0:
            assert (int(u), int(i)) not in pos_set
        else:
            assert (int(u), int(i)) in pos_set


def test_eval_candidates_protocol(inter):
    users, cands, mask, labels = build_eval_candidates(
        inter, num_ng=5, key=jax.random.key(1)
    )
    assert cands.shape == (3, 5)
    for r in range(3):
        c = int(inter.user_pos_count[r])
        valid = int(mask[r].sum())
        assert valid == max(5, c)
        # every positive appears exactly once among the valid slots,
        # wherever the keyed shuffle placed it, and labels mark them
        pos = set(inter.user_pos[r, :c].tolist())
        marked = {int(i) for i, l in zip(cands[r, :valid], labels[r, :valid]) if l == 1}
        assert marked == pos
        assert labels[r, :valid].sum() == c
        # negatives are not positives for this user
        negs = [int(i) for i, l in zip(cands[r, :valid], labels[r, :valid]) if l == 0]
        assert not (set(negs) & pos)
    # deterministic per key
    _, c2, m2, l2 = build_eval_candidates(inter, num_ng=5, key=jax.random.key(1))
    np.testing.assert_array_equal(cands, c2)
    np.testing.assert_array_equal(labels, l2)


def test_eval_candidates_tie_break_is_not_optimistic():
    """A constant scorer must NOT look perfect. The reference scores
    positives-first lists with torch.topk (ncf/trainer.py:213), whose
    low-index tie-break hands a degenerate (all-tied) scorer a perfect
    NDCG — and HPO maximization then selects it. The keyed per-row
    shuffle gives ties their unbiased expectation."""
    import jax

    from pmgt_tpu.data.interactions import InteractionData

    rng = np.random.default_rng(0)
    num_users, num_items, k = 400, 200, 20
    pairs = np.stack(
        [
            np.arange(num_users, dtype=np.int32),
            rng.integers(0, num_items, num_users).astype(np.int32),
        ],
        axis=1,
    )
    data = InteractionData.build(pairs, num_users, num_items)
    _, cands, mask, labels = build_eval_candidates(
        data, num_ng=100, key=jax.random.key(3)
    )
    # constant scores + low-index tie-break = take the first k slots
    hit_at_k = labels[:, :k].sum() / num_users
    # expectation of a random ranking: k / 100 = 0.2 positives in top-20
    assert hit_at_k < 0.5, (
        f"degenerate scorer still ranks positives optimistically: {hit_at_k}"
    )


def test_eval_candidates_more_positives_than_ng():
    pairs = np.array([[0, i] for i in range(4)], np.int32)
    data = InteractionData.build(pairs, num_users=1, num_items=10)
    users, cands, mask, labels = build_eval_candidates(
        data, num_ng=2, key=jax.random.key(0)
    )
    # valid count = max(num_ng, num_pos) = 4, no negatives added
    assert int(mask[0].sum()) == 4
    assert labels[0, :4].sum() == 4
    assert set(cands[0, :4].tolist()) == set(range(4))


def test_native_roundtrip(tmp_path):
    art = make_synthetic_dataset(num_nodes=30, num_users=20, seed=0)
    save_native(str(tmp_path / "SYN"), art)
    loaded = load_artifacts(str(tmp_path), "SYN")
    assert loaded.num_nodes == 30
    assert loaded.num_users == 20
    np.testing.assert_array_equal(loaded.train_pairs, art.train_pairs)
    np.testing.assert_array_equal(
        np.asarray(loaded.graph.nbr_ids), np.asarray(art.graph.nbr_ids)
    )
    assert len(loaded.feat_init_embs) == 2


def test_reference_format_loading(tmp_path):
    """Build artifacts in the reference's exact on-disk format (gpickle +
    joblib LabelEncoders + json dataframes) and load them."""
    import joblib
    import networkx as nx
    import pandas as pd
    from sklearn.preprocessing import LabelEncoder

    d = tmp_path / "REF"
    os.makedirs(d)

    items = [f"item{i}" for i in range(6)]
    users = [f"user{i}" for i in range(4)]
    g = nx.Graph()
    g.add_weighted_edges_from(
        [(items[0], items[1], 1.0), (items[1], items[2], 2.0), (items[3], items[4], 0.5)]
    )
    import pickle

    graph_items = sorted(g.nodes())
    with open(d / "graph.gpickle", "wb") as f:
        pickle.dump(g, f)
    joblib.dump(LabelEncoder().fit(graph_items), d / "node_encoder")
    joblib.dump(LabelEncoder().fit(users), d / "user_encoder")
    joblib.dump(LabelEncoder().fit(items), d / "item_encoder")

    n = len(graph_items)
    np.save(d / "visual_init_emb.npy", np.random.rand(n + 2, 8).astype(np.float32))
    np.save(d / "textual_init_emb.npy", np.random.rand(n + 2, 4).astype(np.float32))

    pd.DataFrame(
        {"reviewerID": [users[0], users[1]], "asin": [items[0], items[2]]}
    ).to_json(d / "train.json")
    pd.DataFrame({"reviewerID": [users[2]], "asin": [items[1]]}).to_json(
        d / "test.json"
    )

    art = load_artifacts(str(tmp_path), "REF")
    assert art.num_nodes == n
    assert art.num_users == 4
    assert art.num_items == 6
    assert art.train_pairs.shape == (2, 2)
    assert len(art.feat_init_embs) == 2
    # graph structure survived: the item1 node has 2 neighbors
    row = graph_items.index(items[1]) + 2
    assert art.graph.degrees[row] == 2


def test_load_node_init_emb_remap():
    item_classes = np.asarray(["a", "b", "c"])
    node_classes = np.asarray(["b", "c"])  # "a" missing → random row
    node_emb = np.asarray([[1.0, 0.0], [0.0, 2.0]], np.float32)
    out = load_node_init_emb(
        item_classes, node_classes, node_emb, normalize=True, seed=0
    )
    assert out.shape == (3, 2)
    # b → node row 0, normalized
    np.testing.assert_allclose(out[1], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[2], [0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_preprocess_pipeline(tmp_path):
    """reviews → graph/splits/embeddings with the notebook's weight formula."""
    import gzip
    import json

    from pmgt_tpu.data.preprocess import run_preprocess

    raw = tmp_path / "raw"
    os.makedirs(raw)
    rng = np.random.default_rng(0)
    # 8 items, 12 users; pre-2015 co-reviews + post-2015 interactions
    pre_ts = 1.3e9  # 2011
    post_ts = 1.5e9  # 2017
    reviews = []
    for u in range(12):
        for i in rng.choice(8, size=5, replace=False):
            reviews.append(
                {
                    "reviewerID": f"u{u}",
                    "asin": f"i{i}",
                    "unixReviewTime": pre_ts + u,
                }
            )
    for u in range(12):
        for i in rng.choice(8, size=3, replace=False):
            reviews.append(
                {
                    "reviewerID": f"u{u}",
                    "asin": f"i{i}",
                    "unixReviewTime": post_ts + u,
                }
            )
    with gzip.open(raw / "reviews.json.gz", "wt") as f:
        for r in reviews:
            f.write(json.dumps(r) + "\n")

    art = run_preprocess(
        raw_dir=str(raw),
        out_dir=str(tmp_path / "data"),
        dataset_name="T",
        min_common_users=2,
        split_date="2015-01-01",
        test_size=0.5,
        seed=0,
        visual_dim=6,
        textual_dim=4,
    )
    assert art.num_nodes > 0
    assert len(art.train_pairs) > 0
    assert art.feat_init_embs[0].shape[1] == 6
    # loadable through the standard path
    loaded = load_artifacts(str(tmp_path / "data"), "T")
    assert loaded.num_nodes == art.num_nodes


def test_preprocess_weight_formula():
    """Edge weights follow (log w + 1)/(log sqrt(deg_u deg_v) + 1)
    (notebook cell 20)."""
    from pmgt_tpu.data.preprocess import build_co_review_graph

    # items A,B share 3 users; B,C share 4; A,C share 3 → triangle
    reviews = []
    for u in range(3):
        reviews += [
            {"reviewerID": f"u{u}", "asin": "A"},
            {"reviewerID": f"u{u}", "asin": "B"},
            {"reviewerID": f"u{u}", "asin": "C"},
        ]
    reviews.append({"reviewerID": "u9", "asin": "B"})
    reviews.append({"reviewerID": "u9", "asin": "C"})
    node_items, edges = build_co_review_graph(reviews, min_common_users=3)
    assert sorted(node_items.tolist()) == ["A", "B", "C"]
    w = {(min(u, v), max(u, v)): wt for u, v, wt in edges}
    # all degrees are 2
    expected_ab = (np.log(3) + 1) / (np.log(np.sqrt(2 * 2)) + 1)
    expected_bc = (np.log(4) + 1) / (np.log(np.sqrt(2 * 2)) + 1)
    a, b, c = (node_items.tolist().index(x) for x in "ABC")
    assert w[(min(a, b), max(a, b))] == pytest.approx(expected_ab)
    assert w[(min(b, c), max(b, c))] == pytest.approx(expected_bc)


def test_ng_sample_fallback_heavy_user():
    """A user who interacted with all items but one: every negative must
    be that one item (the complement rank-select walk must land on the
    single absent id; a sampler that could emit positives would fail)."""
    import jax
    import jax.numpy as jnp

    from pmgt_tpu.data.interactions import InteractionData, ng_sample

    num_items = 30
    items = np.arange(num_items - 1, dtype=np.int32)  # all but item 29
    pairs = np.stack([np.zeros_like(items), items], axis=1)
    data = InteractionData.build(pairs, num_users=1, num_items=num_items)

    users = jnp.asarray(pairs[:, 0])
    row_index = jnp.asarray(data.user_row_index())
    pair_rows = jnp.asarray(data.user_pos)[row_index[users]]
    for seed in range(3):
        neg = np.asarray(
            ng_sample(users, pair_rows, jax.random.key(seed), 4, num_items)
        )
        assert (neg == num_items - 1).all(), np.unique(neg)


def test_complement_rank_select_exact():
    """rank → the rank-th absent item, exactly, for every rank."""
    import jax.numpy as jnp

    from pmgt_tpu.data.interactions import _complement_rank_select

    num_items = 12
    rows = np.array(
        [
            [0, 3, 4, 9, 12, 12],  # complement: 1,2,5,6,7,8,10,11
            [12, 12, 12, 12, 12, 12],  # empty positives: complement = all
            [0, 1, 2, 3, 4, 5],  # complement: 6..11
        ],
        np.int32,
    )
    complements = [
        [1, 2, 5, 6, 7, 8, 10, 11],
        list(range(12)),
        [6, 7, 8, 9, 10, 11],
    ]
    for r, comp in enumerate(complements):
        ranks = jnp.asarray(
            np.arange(len(comp), dtype=np.int32)[None, :]
        )
        got = np.asarray(
            _complement_rank_select(
                jnp.asarray(rows[r : r + 1]), ranks, num_items
            )
        )[0]
        np.testing.assert_array_equal(got, comp)


def test_eval_candidates_chunked_path():
    """>4096 users exercises the chunked negative sampling; protocol
    invariants must hold across chunk boundaries."""
    import jax

    from pmgt_tpu.data.interactions import InteractionData, build_eval_candidates

    rng = np.random.default_rng(5)
    num_users, num_items = 5000, 50
    pairs = np.stack(
        [
            np.arange(num_users, dtype=np.int32),
            rng.integers(0, num_items, num_users).astype(np.int32),
        ],
        axis=1,
    )
    data = InteractionData.build(pairs, num_users, num_items)
    users, cands, mask, labels = build_eval_candidates(
        data, num_ng=3, key=jax.random.key(2)
    )
    assert cands.shape == (num_users, 3)
    np.testing.assert_array_equal(users, np.arange(num_users))
    # exactly one positive per row (wherever the shuffle put it), and
    # the negatives avoid it — across chunk boundaries
    np.testing.assert_array_equal(labels.sum(1), 1.0)
    pos_slot = labels.argmax(1)
    rows = np.arange(num_users)
    np.testing.assert_array_equal(
        cands[rows, pos_slot], data.user_pos[:, 0]
    )
    np.testing.assert_array_equal(mask.sum(1), 3.0)
    neg_mask = labels == 0
    assert not (
        (cands == data.user_pos[:, :1]) & neg_mask
    ).any()


def test_ng_sample_uniform_over_complement():
    """Rank-select negatives are statistically uniform over the complement
    set (the reference rejection loop's limiting distribution)."""
    import jax
    import jax.numpy as jnp

    from pmgt_tpu.data.interactions import InteractionData, ng_sample

    num_items = 30
    pos = np.arange(0, 20, 2, dtype=np.int32)  # 10 positives, even ids
    pairs = np.stack([np.zeros_like(pos), pos], axis=1)
    data = InteractionData.build(pairs, num_users=1, num_items=num_items)

    draws = np.asarray(
        ng_sample(
            jnp.zeros((2000,), jnp.int32),
            jnp.broadcast_to(jnp.asarray(data.user_pos), (2000, data.user_pos.shape[1])),
            jax.random.key(0),
            8,
            num_items,
        )
    ).ravel()
    complement = sorted(set(range(num_items)) - set(pos.tolist()))
    assert set(np.unique(draws)) == set(complement)
    freq = np.bincount(draws, minlength=num_items)[complement] / len(draws)
    tv = 0.5 * np.abs(freq - 1.0 / len(complement)).sum()
    assert tv < 0.02, f"TV distance from uniform too high: {tv}"


def test_published_shape_dataset():
    """make_published_shape_dataset hits the EXACT published VG counts
    (reference README.md:129-167) with power-law degrees/activity,
    min degree 1, nonnegative visual features, and determinism."""
    from pmgt_tpu.data.synthetic import (
        PUBLISHED_SHAPES,
        make_published_shape_dataset,
    )

    spec = PUBLISHED_SHAPES["VG"]
    art = make_published_shape_dataset("VG", feat_dims=(16, 8), seed=3)
    deg = np.asarray(art.graph.degrees)[2:]
    assert art.num_nodes == spec["num_nodes"]
    assert art.num_users == spec["num_users"]
    assert int(deg.sum()) // 2 == spec["num_edges"]
    n_inter = len(art.train_pairs) + len(art.test_pairs)
    assert n_inter == spec["num_interactions"]
    # reference's global random 80/20 split
    assert len(art.test_pairs) == round(n_inter * 0.2)
    assert deg.min() >= 1
    # Power-law signatures: heavy tails relative to the mean in both the
    # degree and the per-user activity distributions.
    assert deg.max() > 10 * deg.mean()
    assert np.median(deg) < deg.mean()
    users = np.concatenate([art.train_pairs[:, 0], art.test_pairs[:, 0]])
    upc = np.bincount(users, minlength=art.num_users)
    assert upc.max() > 5 * upc.mean()
    # popularity couples graph degree and interaction frequency
    items = np.concatenate([art.train_pairs[:, 1], art.test_pairs[:, 1]])
    ipc = np.bincount(items, minlength=art.num_items)
    assert np.corrcoef(deg, ipc)[0, 1] > 0.5
    # feature statistics: visual (Inception avg-pool) nonneg, textual not
    assert (art.feat_init_embs[0] >= 0).all()
    assert (art.feat_init_embs[1] < 0).any()
    assert (art.feat_init_embs[0][:2] == 0).all()  # special rows zeroed
    # deterministic per seed
    art2 = make_published_shape_dataset("VG", feat_dims=(16, 8), seed=3)
    assert np.array_equal(art.train_pairs, art2.train_pairs)
    assert np.array_equal(
        np.asarray(art.graph.nbr_ids), np.asarray(art2.graph.nbr_ids)
    )


def test_published_shape_signal_only_reshapes_interactions():
    """The signal knob (VERDICT r3 #4) must leave the graph, features,
    and interaction COUNT untouched at fixed seed — calibration sweeps
    reuse one PMGT pretrain across signal values — while actually
    changing which interactions are drawn."""
    from pmgt_tpu.data.synthetic import make_published_shape_dataset

    a = make_published_shape_dataset("VG", feat_dims=(12, 6), seed=7,
                                     signal=1.0)
    b = make_published_shape_dataset("VG", feat_dims=(12, 6), seed=7,
                                     signal=0.6)
    assert np.array_equal(
        np.asarray(a.graph.nbr_ids), np.asarray(b.graph.nbr_ids)
    )
    for fa, fb in zip(a.feat_init_embs, b.feat_init_embs):
        assert np.array_equal(fa, fb)
    n_a = len(a.train_pairs) + len(a.test_pairs)
    n_b = len(b.train_pairs) + len(b.test_pairs)
    assert n_a == n_b
    assert not np.array_equal(a.train_pairs, b.train_pairs)


def test_eval_candidates_reference_tiebreak():
    """--reference-tiebreak restores the reference's exact candidate
    layout: positives occupy the leading slots so a constant scorer +
    low-index tie-break ranks them perfectly (reference
    ncf/trainer.py:213 + ncf/datasets.py:106-128). Default mode shuffles
    them away from the optimistic layout."""
    import jax

    from pmgt_tpu.data.interactions import InteractionData, build_eval_candidates

    rng = np.random.default_rng(11)
    num_users, num_items = 64, 200
    pairs = np.stack(
        [
            np.repeat(np.arange(num_users, dtype=np.int32), 3),
            rng.integers(0, num_items, num_users * 3).astype(np.int32),
        ],
        axis=1,
    )
    data = InteractionData.build(pairs, num_users, num_items)
    key = jax.random.key(7)
    users, cands, mask, labels = build_eval_candidates(
        data, num_ng=20, key=key, reference_tiebreak=True
    )
    counts = data.user_pos_count
    # positives-first layout: labels are a prefix of ones per row
    col = np.arange(labels.shape[1])[None, :]
    np.testing.assert_array_equal(labels, (col < counts[:, None]).astype(np.float32))
    np.testing.assert_array_equal(
        np.sort(cands[0, : counts[0]]), data.user_pos[0, : counts[0]]
    )
    # same key without the flag: identical candidate SETS, shuffled rows
    users2, cands2, mask2, labels2 = build_eval_candidates(
        data, num_ng=20, key=key, reference_tiebreak=False
    )
    np.testing.assert_array_equal(mask, mask2)
    for r in range(num_users):
        valid = mask[r] == 1
        np.testing.assert_array_equal(
            np.sort(cands[r][valid]), np.sort(cands2[r][valid])
        )
    assert not np.array_equal(labels, labels2)  # at least one row moved
    # the artifact itself: a CONSTANT scorer's top-k under low-index
    # tie-break hits only positives in reference mode
    top = np.argsort(-np.where(mask > 0, 0.0, -np.inf), axis=1, kind="stable")[:, :1]
    hits = np.take_along_axis(labels, top, axis=1)
    assert hits.min() == 1.0  # perfect "ranking" — the reference's bug
    hits2 = np.take_along_axis(labels2, top, axis=1)
    assert hits2.mean() < 1.0  # shuffled mode breaks it
