"""Dataset artifact container and on-disk formats.

Two formats load through the same entry point:

- **native** (``save_native``): compressed npz + json written by this
  framework — the padded-CSR graph, init embedding tables, interaction
  splits, and metadata. Fast to load, no pickle.
- **reference**: the exact artifact contract of uoo723/PMGT —
  ``graph.gpickle`` (networkx), ``{node,user,item}_encoder`` (joblib
  LabelEncoders), ``{visual,textual}_init_emb.npy``, ``train.json`` /
  ``test.json`` (pandas dataframes with reviewerID/asin columns) — as
  produced by notebooks/PMGT.ipynb and consumed by reference
  pmgt/pmgt/trainer.py:34-41 and pmgt/ncf/trainer.py:35-39. A user of the
  reference can point this framework at their existing data directory.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from pmgt_tpu.graph.container import PaddedGraph, from_edges

_META_FILE = "meta.json"
_NATIVE_FORMAT = "pmgt_tpu-native-v1"


@dataclass
class DatasetArtifacts:
    """Everything a workload needs, in memory.

    Node-id convention matches the reference (pmgt/pmgt/trainer.py:38-41):
    0 = <pad>, 1 = <mask>, real nodes 2..N+1. ``feat_init_embs`` tables
    have N+2 rows with rows 0/1 zeroed (notebook cell 30). ``train_pairs``
    / ``test_pairs`` are (user, item) int32 pairs in encoder id space.

    ``item_classes`` / ``node_classes`` are the LabelEncoder class arrays
    when loaded from reference artifacts (None for synthetic data, where
    item ids and node ids coincide) — used by ``load_node_init_emb`` to
    remap exported node embeddings into downstream item-id space
    (reference pmgt/pmgt/utils.py:15-40).
    """

    graph: PaddedGraph
    feat_init_embs: List[np.ndarray]
    train_pairs: np.ndarray
    test_pairs: np.ndarray
    num_users: int
    num_items: int
    item_classes: Optional[np.ndarray] = None
    node_classes: Optional[np.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return self.graph.num_nodes


def save_native(out_dir: str, art: DatasetArtifacts) -> None:
    """Write artifacts in the native format under ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    art.graph.save(os.path.join(out_dir, "graph.npz"))
    np.savez_compressed(
        os.path.join(out_dir, "init_embs.npz"),
        **{
            f"feat_{i}": np.asarray(t, np.float32)
            for i, t in enumerate(art.feat_init_embs)
        },
    )
    np.savez_compressed(
        os.path.join(out_dir, "interactions.npz"),
        train_pairs=np.asarray(art.train_pairs, np.int32),
        test_pairs=np.asarray(art.test_pairs, np.int32),
    )
    if art.item_classes is not None and art.node_classes is not None:
        # Cast to unicode so the npz stays pickle-free.
        np.savez_compressed(
            os.path.join(out_dir, "classes.npz"),
            item_classes=np.asarray(art.item_classes).astype(str),
            node_classes=np.asarray(art.node_classes).astype(str),
        )
    with open(os.path.join(out_dir, _META_FILE), "w") as f:
        json.dump(
            {
                "format": _NATIVE_FORMAT,
                "num_users": int(art.num_users),
                "num_items": int(art.num_items),
                "num_nodes": int(art.num_nodes),
            },
            f,
        )


def _load_native(d: str) -> DatasetArtifacts:
    with open(os.path.join(d, _META_FILE)) as f:
        meta = json.load(f)
    graph = PaddedGraph.load(os.path.join(d, "graph.npz"))
    with np.load(os.path.join(d, "init_embs.npz")) as z:
        feats = [z[f"feat_{i}"] for i in range(len(z.files))]
    with np.load(os.path.join(d, "interactions.npz")) as z:
        train_pairs = z["train_pairs"]
        test_pairs = z["test_pairs"]
    item_classes = node_classes = None
    classes_path = os.path.join(d, "classes.npz")
    if os.path.exists(classes_path):
        with np.load(classes_path, allow_pickle=False) as z:
            item_classes = z["item_classes"]
            node_classes = z["node_classes"]
    return DatasetArtifacts(
        graph=graph,
        feat_init_embs=feats,
        train_pairs=train_pairs,
        test_pairs=test_pairs,
        num_users=int(meta["num_users"]),
        num_items=int(meta["num_items"]),
        item_classes=item_classes,
        node_classes=node_classes,
    )


def _read_pairs_json(path, user_encoder, item_encoder) -> np.ndarray:
    """reviewerID/asin dataframe json → encoded (user, item) int32 pairs
    (the reference encodes with the same LabelEncoders,
    ncf/trainer.py:40-52)."""
    import pandas as pd

    df = pd.read_json(path)
    users = user_encoder.transform(df["reviewerID"].to_numpy())
    items = item_encoder.transform(df["asin"].to_numpy())
    return np.stack([users, items], axis=1).astype(np.int32)


def _load_reference(d: str) -> DatasetArtifacts:
    """Load the reference's on-disk artifact layout (see module docstring).

    The graph's labeled nodes are relabeled through ``node_encoder`` to
    0..N-1 then shifted by the two special ids inside ``from_edges`` —
    the reference's relabel-to-ids≥2 step (pmgt/pmgt/trainer.py:38-41).

    SECURITY: ``graph.gpickle`` is unpickled and the encoders go through
    ``joblib.load`` — both execute arbitrary code from the data directory
    (inherent to the reference's artifact contract). Only point this at
    trusted dataset directories.
    """
    import pickle

    import joblib

    with open(os.path.join(d, "graph.gpickle"), "rb") as f:
        g = pickle.load(f)
    node_encoder = joblib.load(os.path.join(d, "node_encoder"))
    user_encoder = joblib.load(os.path.join(d, "user_encoder"))
    item_encoder = joblib.load(os.path.join(d, "item_encoder"))
    node_classes = np.asarray(node_encoder.classes_)
    node_idx = {label: i for i, label in enumerate(node_classes.tolist())}

    edges = []
    for u, v, data in g.edges(data=True):
        edges.append((node_idx[u], node_idx[v], float(data.get("weight", 1.0))))
    graph = from_edges(len(node_classes), edges)

    feats = [
        np.load(os.path.join(d, f"{m}_init_emb.npy"))
        for m in ("visual", "textual")
    ]
    train_pairs = _read_pairs_json(
        os.path.join(d, "train.json"), user_encoder, item_encoder
    )
    test_pairs = _read_pairs_json(
        os.path.join(d, "test.json"), user_encoder, item_encoder
    )
    return DatasetArtifacts(
        graph=graph,
        feat_init_embs=feats,
        train_pairs=train_pairs,
        test_pairs=test_pairs,
        num_users=len(user_encoder.classes_),
        num_items=len(item_encoder.classes_),
        item_classes=np.asarray(item_encoder.classes_),
        node_classes=node_classes,
    )


def load_artifacts(data_dir: str, dataset_name: str) -> DatasetArtifacts:
    """Load ``<data_dir>/<dataset_name>`` in whichever format is present."""
    d = os.path.join(data_dir, dataset_name)
    if os.path.exists(os.path.join(d, _META_FILE)):
        return _load_native(d)
    if os.path.exists(os.path.join(d, "graph.gpickle")):
        return _load_reference(d)
    raise FileNotFoundError(
        f"no dataset artifacts under {d}: expected native ({_META_FILE}) "
        "or reference (graph.gpickle) layout"
    )


def load_node_init_emb(
    item_classes: Optional[np.ndarray],
    node_classes: Optional[np.ndarray],
    node_emb: np.ndarray,
    normalize: bool = False,
    seed: int = 0,
) -> np.ndarray:
    """Remap exported PMGT node embeddings ([num_nodes, d], node-id order)
    into downstream item-id space (reference pmgt/pmgt/utils.py:15-40).

    Items absent from the graph get a random-normal row (reference
    utils.py:30-33); ``normalize`` applies sklearn-style row L2
    normalization to the full table (utils.py:36-38).
    """
    node_emb = np.asarray(node_emb, np.float32)
    if item_classes is None or node_classes is None:
        out = node_emb.copy()
    else:
        item_classes = np.asarray(item_classes)
        node_classes = np.asarray(node_classes)
        rng = np.random.default_rng(seed)
        node_idx = {
            label: i for i, label in enumerate(node_classes.tolist())
        }
        out = np.empty((len(item_classes), node_emb.shape[1]), np.float32)
        for i, label in enumerate(item_classes.tolist()):
            row = node_idx.get(label)
            if row is None:
                out[i] = rng.normal(size=node_emb.shape[1]).astype(np.float32)
            else:
                out[i] = node_emb[row]
    if normalize:
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        out = out / np.maximum(norms, 1e-12)
    return out
