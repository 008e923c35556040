"""Build a miniature dataset fixture in the reference's EXACT on-disk
artifact format, plus the matching raw reviews dump.

Purpose: the published-numbers reproduction harness
(tools/reproduce_published.py) must be provable end to end without
network access. This generates a tiny clustered co-review world and
writes it twice:

1. ``<out>/raw/reviews.json.gz`` — a raw Amazon-style 5-core dump
   (one JSON object per line: reviewerID / asin / unixReviewTime /
   reviewText), the input of stage "preprocess";
2. ``<out>/data/MINI/`` — the reference artifact contract
   (graph.gpickle + {node,user,item}_encoder joblib LabelEncoders +
   {visual,textual}_init_emb.npy + train.json/test.json), exactly what
   notebooks/PMGT.ipynb cells 20-30 emit and reference
   pmgt/pmgt/trainer.py:34-41 / ncf/trainer.py:35-39 consume — the
   input of stages "pretrain"…"compare".

Both views are generated from the same underlying reviews so
preprocess(raw) and the reference-format artifacts describe the same
world. Everything is deterministic in ``seed``.

Run: python tools/make_ref_fixture.py [--out tests/fixtures/ref_mini]
"""
from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
from datetime import datetime, timezone

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pmgt_tpu.data.preprocess import _graph_from_pairs  # noqa: E402
from pmgt_tpu.graph.container import NUM_SPECIAL_NODES  # noqa: E402

NUM_CLUSTERS = 4
ITEMS_PER_CLUSTER = 16
NUM_USERS = 48
PRE_REVIEWS_PER_USER = 8
POST_REVIEWS_PER_USER = 6
VISUAL_DIM, TEXTUAL_DIM = 48, 32
PRE_TS = int(datetime(2014, 6, 1, tzinfo=timezone.utc).timestamp())
POST_TS = int(datetime(2016, 6, 1, tzinfo=timezone.utc).timestamp())

_WORDS = (
    "great fun classic game toy kids family quality sturdy colorful "
    "bright easy hard puzzle strategy party gift birthday value cheap "
    "durable plastic wooden educational creative"
).split()


def _make_reviews(rng: np.random.Generator):
    """(user, asin, ts, text) tuples: clustered pre-cutoff co-reviews and
    post-cutoff interactions over the same clusters."""
    items = [
        [f"ITEM{c:02d}{i:02d}" for i in range(ITEMS_PER_CLUSTER)]
        for c in range(NUM_CLUSTERS)
    ]
    users = [f"USER{u:03d}" for u in range(NUM_USERS)]
    reviews = []
    for u, user in enumerate(users):
        c = u % NUM_CLUSTERS
        pre_items = rng.choice(
            items[c], size=PRE_REVIEWS_PER_USER, replace=False
        )
        for j, asin in enumerate(pre_items):
            text = " ".join(rng.choice(_WORDS, size=8))
            reviews.append((user, str(asin), PRE_TS + u * 977 + j, text))
        post_items = rng.choice(
            items[c], size=POST_REVIEWS_PER_USER, replace=False
        )
        for j, asin in enumerate(post_items):
            reviews.append((user, str(asin), POST_TS + u * 977 + j, ""))
    return reviews


def _cluster_features(rng, node_items, dim):
    """Cluster-structured rows (centroid + noise): graph structure is
    predictive of features, so NFR/GSR pretraining carries real signal."""
    centroids = rng.normal(size=(NUM_CLUSTERS, dim)).astype(np.float32) * 2.0
    table = np.zeros((len(node_items) + NUM_SPECIAL_NODES, dim), np.float32)
    for i, asin in enumerate(node_items):
        c = int(str(asin)[4:6])
        table[NUM_SPECIAL_NODES + i] = centroids[c] + rng.normal(
            size=dim
        ).astype(np.float32) * 0.3
    return table


def build_fixture(out_dir: str, seed: int = 0) -> dict:
    """Write raw + reference-format fixture; returns a summary dict."""
    rng = np.random.default_rng(seed)
    reviews = _make_reviews(rng)

    # --- raw dump (notebook cell 4's download result) ---
    raw_dir = os.path.join(out_dir, "raw")
    os.makedirs(raw_dir, exist_ok=True)
    with gzip.open(
        os.path.join(raw_dir, "reviews.json.gz"), "wt", encoding="utf-8"
    ) as f:
        for user, asin, ts, text in reviews:
            f.write(
                json.dumps(
                    {
                        "reviewerID": user,
                        "asin": asin,
                        "unixReviewTime": ts,
                        "reviewText": text,
                        "overall": 5.0,
                    }
                )
                + "\n"
            )

    # --- reference-format artifacts ---
    import joblib
    import networkx as nx
    import pandas as pd
    from sklearn.preprocessing import LabelEncoder

    cutoff = datetime(2015, 1, 1, tzinfo=timezone.utc).timestamp()
    pre = [(u, a) for u, a, ts, _ in reviews if ts < cutoff]
    post = sorted({(u, a) for u, a, ts, _ in reviews if ts >= cutoff})

    node_items, edges = _graph_from_pairs(set(pre), min_common_users=3)
    node_labels = [str(a) for a in node_items.tolist()]
    g = nx.Graph()
    g.add_nodes_from(node_labels)
    for u, v, w in edges:
        g.add_edge(node_labels[u], node_labels[v], weight=float(w))

    node_set = set(node_labels)
    inter = [(u, a) for u, a in post if a in node_set]
    user_classes = sorted({u for u, _ in inter})
    item_classes = sorted({a for _, a in inter})

    node_encoder = LabelEncoder().fit(node_labels)
    user_encoder = LabelEncoder().fit(user_classes)
    item_encoder = LabelEncoder().fit(item_classes)

    from sklearn.model_selection import train_test_split

    inter_arr = np.asarray(inter, dtype=object)
    train_rows, test_rows = train_test_split(
        inter_arr, test_size=0.2, random_state=seed
    )

    data_dir = os.path.join(out_dir, "data", "MINI")
    os.makedirs(data_dir, exist_ok=True)
    import pickle

    with open(os.path.join(data_dir, "graph.gpickle"), "wb") as f:
        pickle.dump(g, f)
    joblib.dump(node_encoder, os.path.join(data_dir, "node_encoder"))
    joblib.dump(user_encoder, os.path.join(data_dir, "user_encoder"))
    joblib.dump(item_encoder, os.path.join(data_dir, "item_encoder"))

    # node_encoder.classes_ order defines table row order (loader maps
    # labels through the encoder classes, data/artifacts.py:151-157)
    ordered = [str(a) for a in node_encoder.classes_.tolist()]
    np.save(
        os.path.join(data_dir, "visual_init_emb.npy"),
        _cluster_features(rng, ordered, VISUAL_DIM),
    )
    np.save(
        os.path.join(data_dir, "textual_init_emb.npy"),
        _cluster_features(rng, ordered, TEXTUAL_DIM),
    )

    for name, rows in (("train.json", train_rows), ("test.json", test_rows)):
        pd.DataFrame(
            {"reviewerID": rows[:, 0], "asin": rows[:, 1]}
        ).to_json(os.path.join(data_dir, name))

    summary = {
        "nodes": len(node_labels),
        "edges": g.number_of_edges(),
        "users": len(user_classes),
        "items": len(item_classes),
        "train_pairs": int(len(train_rows)),
        "test_pairs": int(len(test_rows)),
        "raw_reviews": len(reviews),
    }
    return summary


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/fixtures/ref_mini")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    print(json.dumps(build_fixture(a.out, a.seed)))
