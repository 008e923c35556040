"""Offline preprocessing pipeline: raw reviews → graph + splits + feature
tables, replacing the reference notebook (notebooks/PMGT.ipynb).

Stages (notebook cell numbers in parens):
1. optional dump download (4) — ``pmgt_tpu.data.ingest``;
2. temporal split at ``split_date`` (9): pre-cutoff reviews build the
   graph and features, post-cutoff reviews become downstream
   interactions;
3. item-item co-review graph (20): edges where ≥ ``min_common_users``
   users reviewed both items, weight (log w + 1)/(log √(deg_u·deg_v) + 1);
4. label encoding (22, 26) and random train/test interaction split (24,
   28) filtered to graph items;
5. init embedding tables (30): rows 0/1 zeroed for <pad>/<mask>,
   random-normal rows for feature-less items; with
   ``extract_features=True`` the Inception-v4/BERT extractors (15, 18)
   fill real rows, falling back per modality when weights are
   unavailable.

Output: native artifacts under ``<out_dir>/<dataset_name>`` plus
notebook-format intermediate npz feature files under ``out_dir``.
"""
from __future__ import annotations

import gzip
import json
import logging
import os
from datetime import datetime, timezone
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

from pmgt_tpu.data.artifacts import DatasetArtifacts, save_native
from pmgt_tpu.graph.container import NUM_SPECIAL_NODES, from_edges

logger = logging.getLogger("pmgt_tpu")


def _find_review_dumps(raw_dir: str) -> List[str]:
    """Review-dump candidates in ``raw_dir`` (json-lines, optionally
    gzipped; metadata dumps excluded) — the ONE detection predicate,
    shared by ``_load_reviews`` and ``run_preprocess``'s --download
    guard so the two cannot drift."""
    if not os.path.isdir(raw_dir):
        return []
    return [
        os.path.join(raw_dir, n)
        for n in sorted(os.listdir(raw_dir))
        if n.endswith((".json", ".json.gz")) and not n.startswith("meta")
    ]


def _load_reviews(
    raw_dir: str, keep_text: bool = False
) -> List[Tuple[str, str, float, str]]:
    """Stream the first reviews dump found in ``raw_dir`` (json-lines,
    optionally gzipped) into compact (user, asin, timestamp, text) tuples —
    only the fields the pipeline uses, so multi-GB category dumps don't
    cost a dict per review. ``text`` is "" unless ``keep_text``."""
    candidates = _find_review_dumps(raw_dir)
    if not candidates:
        raise FileNotFoundError(f"no reviews dump (*.json[.gz]) in {raw_dir}")
    path = candidates[0]
    opener = gzip.open if path.endswith(".gz") else open
    reviews = []
    with opener(path, "rt") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                row = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            user, asin = row.get("reviewerID"), row.get("asin")
            if not (user and asin):
                continue
            reviews.append(
                (
                    user,
                    asin,
                    float(row.get("unixReviewTime", 0)),
                    (row.get("reviewText") or "") if keep_text else "",
                )
            )
    logger.info("loaded %d reviews from %s", len(reviews), path)
    return reviews


def build_co_review_graph(
    reviews: Iterable[dict], min_common_users: int = 3
) -> Tuple[np.ndarray, List[Tuple[int, int, float]]]:
    """Item-item co-review graph (notebook cell 20).

    Co-review counts come from ``item_user_mat @ item_user_matᵀ``; edges
    with ≥ ``min_common_users`` common reviewers are kept with weight
    ``(log w + 1) / (log sqrt(deg_u * deg_v) + 1)`` where degrees are
    counted on the thresholded graph.

    Returns (node_items: sorted asins that kept ≥1 edge,
    edges: (u_idx, v_idx, weight) with indices into node_items).

    The pair counting — the O(Σ per-user reviews²) hot part at production
    scale — runs in the native C++ builder when available
    (pmgt_tpu/native/co_review.cpp), falling back to a scipy sparse
    matmul; both paths are equivalence-tested (tests/test_native.py).
    """
    return _graph_from_pairs(
        {(r["reviewerID"], r["asin"]) for r in reviews}, min_common_users
    )


def _graph_from_pairs(
    pairs, min_common_users: int
) -> Tuple[np.ndarray, List[Tuple[int, int, float]]]:
    if not pairs:
        return np.asarray([], dtype=object), []
    users = sorted({u for u, _ in pairs})
    items = sorted({a for _, a in pairs})
    uidx = {u: i for i, u in enumerate(users)}
    iidx = {a: i for i, a in enumerate(items)}
    rows = np.asarray([iidx[a] for _, a in pairs], np.int32)
    cols = np.asarray([uidx[u] for u, _ in pairs], np.int32)

    from pmgt_tpu.native import co_review_edges_native

    native = co_review_edges_native(rows, cols, min_common_users)
    if native is not None:
        src, dst, counts = native
    else:
        import scipy.sparse as sp

        mat = sp.csr_matrix(
            (np.ones(len(pairs), np.int64), (rows, cols)),
            shape=(len(items), len(users)),
        )
        co = sp.triu(mat @ mat.T, k=1).tocoo()
        keep = co.data >= min_common_users
        src, dst, counts = co.row[keep], co.col[keep], co.data[keep]

    raw_edges = {
        (int(u), int(v)): int(w) for u, v, w in zip(src, dst, counts)
    }
    deg = np.zeros(len(items), np.int64)
    for u, v in raw_edges:
        deg[u] += 1
        deg[v] += 1

    kept_items = np.asarray(
        [items[i] for i in range(len(items)) if deg[i] > 0], dtype=object
    )
    remap = {iidx[a]: k for k, a in enumerate(kept_items.tolist())}
    edges = [
        (
            remap[u],
            remap[v],
            float(
                (np.log(w) + 1.0)
                / (np.log(np.sqrt(deg[u] * deg[v])) + 1.0)
            ),
        )
        for (u, v), w in sorted(raw_edges.items())
    ]
    return kept_items, edges


def _split_timestamp(split_date: str) -> float:
    return datetime.strptime(split_date, "%Y-%m-%d").replace(
        tzinfo=timezone.utc
    ).timestamp()


def _random_table(
    rng: np.random.Generator, num_nodes: int, dim: int
) -> np.ndarray:
    """Init table with zeroed special rows and random-normal node rows
    (notebook cell 30)."""
    table = np.zeros((num_nodes + NUM_SPECIAL_NODES, dim), np.float32)
    table[NUM_SPECIAL_NODES:] = rng.normal(
        size=(num_nodes, dim)
    ).astype(np.float32)
    return table


def _fill_table(
    rng: np.random.Generator,
    num_nodes: int,
    node_idx: Dict[str, int],
    feats: np.ndarray,
    mapping: Sequence[str],
) -> np.ndarray:
    """Extracted rows over a random-fallback base (feature-less items keep
    random rows, notebook cell 30)."""
    table = _random_table(rng, num_nodes, feats.shape[1])
    for asin, row in zip(mapping, feats):
        idx = node_idx.get(asin)
        if idx is not None:
            table[NUM_SPECIAL_NODES + idx] = row
    return table


def _load_feats_npz(path: str):
    """Pre-extracted feature drop-in: a user with computed features but
    no egress (or no GPU) seeds ``<out_dir>/<dataset>_{visual,textual}_
    feats.npz`` (keys: ``feats`` [n, dim], ``asins`` [n]) — the exact
    files the extractors below write — and extraction is skipped."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=True) as data:
        feats = np.asarray(data["feats"], np.float32)
        mapping = [str(a) for a in data["asins"].tolist()]
    logger.info(
        "using pre-extracted features from %s (%d items, %d-d); "
        "extraction skipped", path, len(mapping), feats.shape[1],
    )
    return feats, mapping


def _extract_visual(
    raw_dir, out_dir, dataset_name, image_model, device,
    visual_model, visual_transform,
):
    out_npz = os.path.join(out_dir, f"{dataset_name}_visual_feats.npz")
    seeded = _load_feats_npz(out_npz)
    if seeded is not None:
        return seeded
    from pmgt_tpu.data.feature_extraction import (
        extract_visual_features,
        iter_item_images,
    )

    images_dir = os.path.join(raw_dir, "images")
    feats, mapping = extract_visual_features(
        iter_item_images(images_dir),
        model=visual_model,
        transform=visual_transform,
        model_name=image_model,
        device=device,
    )
    if not len(mapping):
        raise RuntimeError(f"no item images under {images_dir}")
    np.savez_compressed(
        out_npz,
        feats=feats,
        asins=np.asarray(mapping, dtype=object),
    )
    return feats, mapping


def _extract_textual(
    out_dir, dataset_name, node_texts, text_model, device
):
    out_npz = os.path.join(out_dir, f"{dataset_name}_textual_feats.npz")
    seeded = _load_feats_npz(out_npz)
    if seeded is not None:
        return seeded
    from pmgt_tpu.data.feature_extraction import extract_textual_features

    feats, mapping = extract_textual_features(
        node_texts, model_name=text_model, device=device
    )
    if not len(mapping):
        raise RuntimeError("no review texts to extract from")
    np.savez_compressed(
        out_npz,
        feats=feats,
        asins=np.asarray(mapping, dtype=object),
    )
    return feats, mapping


def run_preprocess(
    raw_dir: str,
    out_dir: str,
    dataset_name: str,
    min_common_users: int = 3,
    split_date: str = "2015-01-01",
    test_size: float = 0.2,
    seed: int = 0,
    visual_dim: int = 1536,
    textual_dim: int = 768,
    extract_features: bool = False,
    text_model: str = "bert-base-uncased",
    image_model: str = "inception_v4",
    feature_device: str = "cpu",
    visual_model=None,
    visual_transform=None,
    download: bool = False,
) -> DatasetArtifacts:
    """Run the full pipeline (module docstring) and return the artifacts,
    also saved natively under ``<out_dir>/<dataset_name>``."""
    os.makedirs(out_dir, exist_ok=True)
    if not (0 <= test_size < 1):
        # test_size=1.0 (or a typo'd 20 meaning 20%) would silently
        # produce train=all / test=EMPTY under the old guard — the exact
        # opposite of sklearn's meaning. 0 stays the explicit no-test
        # value.
        raise ValueError(
            f"test_size must be in [0, 1), got {test_size} "
            f"(0 = no test split)"
        )
    if download and not _find_review_dumps(raw_dir):
        from pmgt_tpu.data.ingest import download_reviews

        download_reviews(dataset_name, raw_dir)

    reviews = _load_reviews(raw_dir, keep_text=extract_features)
    cutoff = _split_timestamp(split_date)
    pre = [r for r in reviews if r[2] < cutoff]
    post = [r for r in reviews if r[2] >= cutoff]
    del reviews
    logger.info(
        "temporal split at %s: %d graph reviews / %d interaction reviews",
        split_date,
        len(pre),
        len(post),
    )

    node_items, edges = _graph_from_pairs(
        {(u, a) for u, a, _, _ in pre}, min_common_users
    )
    if not len(node_items):
        raise ValueError(
            "empty co-review graph: lower --min-common-users or check the "
            "temporal split"
        )
    node_idx = {a: i for i, a in enumerate(node_items.tolist())}
    graph = from_edges(len(node_items), edges)

    # Interactions: post-cutoff (user, item) filtered to graph items
    # (notebook cells 24, 28).
    inter = sorted(
        {(u, a) for u, a, _, _ in post if a in node_idx}
    )
    if not inter:
        raise ValueError("no post-split interactions over graph items")
    user_classes = np.asarray(sorted({u for u, _ in inter}), dtype=object)
    item_classes = np.asarray(sorted({a for _, a in inter}), dtype=object)
    u_enc = {u: i for i, u in enumerate(user_classes.tolist())}
    i_enc = {a: i for i, a in enumerate(item_classes.tolist())}
    pairs = np.asarray(
        [(u_enc[u], i_enc[a]) for u, a in inter], np.int32
    )
    from sklearn.model_selection import train_test_split

    if len(pairs) > 1 and 0 < test_size < 1:
        train_pairs, test_pairs = train_test_split(
            pairs, test_size=test_size, random_state=seed
        )
    else:
        train_pairs, test_pairs = pairs, pairs[:0]

    # Feature tables. Independent per-modality streams: threading ONE
    # rng through both builds made the textual fallback rows depend on
    # how many draws the visual path consumed (its dim, or whether it
    # fell back at all) — same-seed artifacts then differed across
    # visual-path variations for purely textual-looking reasons.
    rng_v = np.random.default_rng([seed, 1])
    rng_t = np.random.default_rng([seed, 2])
    n = len(node_items)
    if extract_features:
        try:
            feats, mapping = _extract_visual(
                raw_dir, out_dir, dataset_name, image_model,
                feature_device, visual_model, visual_transform,
            )
            visual = _fill_table(rng_v, n, node_idx, feats, mapping)
        except Exception as exc:  # noqa: BLE001 — weights-gated fallback
            logger.warning(
                "visual extraction unavailable (%s); falling back to "
                "random %d-d rows",
                exc,
                visual_dim,
            )
            visual = _random_table(rng_v, n, visual_dim)
        node_texts = {}
        for _, asin, _, text in pre:
            if text and asin in node_idx:
                node_texts.setdefault(asin, []).append(text)
        try:
            feats, mapping = _extract_textual(
                out_dir, dataset_name, node_texts, text_model, feature_device
            )
            textual = _fill_table(rng_t, n, node_idx, feats, mapping)
        except Exception as exc:  # noqa: BLE001
            logger.warning(
                "textual extraction unavailable (%s); falling back to "
                "random %d-d rows",
                exc,
                textual_dim,
            )
            textual = _random_table(rng_t, n, textual_dim)
    else:
        visual = _random_table(rng_v, n, visual_dim)
        textual = _random_table(rng_t, n, textual_dim)

    art = DatasetArtifacts(
        graph=graph,
        feat_init_embs=[visual, textual],
        train_pairs=np.ascontiguousarray(train_pairs),
        test_pairs=np.ascontiguousarray(test_pairs),
        num_users=len(user_classes),
        num_items=len(item_classes),
        item_classes=item_classes,
        node_classes=node_items,
    )
    save_native(os.path.join(out_dir, dataset_name), art)
    logger.info(
        "preprocessed %s: %d nodes / %d edges, %d users, %d items, "
        "%d train / %d test pairs",
        dataset_name,
        n,
        len(edges),
        art.num_users,
        art.num_items,
        len(train_pairs),
        len(test_pairs),
    )
    return art
