"""Ranking / classification metrics.

Exact behavioral port of the reference's metric semantics
(pmgt/metrics.py:16-37) without the sklearn MultiLabelBinarizer machinery:
predictions are arrays of item ids, ground truth is a per-user set of item
ids. Includes the reference's idiosyncratic ideal-DCG normalizer
``log.cumsum()[min(#gt, top) - 1]`` (metrics.py:26).

These run on host (numpy) over small eval outputs; the expensive part —
batched candidate scoring and top-k — happens on device inside the task
eval loops (tasks/ncf_task.py, tasks/dcn_task.py).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def _to_sets(targets) -> list:
    return [set(int(i) for i in t) for t in targets]


def get_ndcg(
    prediction: np.ndarray, targets: Sequence[Sequence[int]], top: int = 5
) -> float:
    """NDCG@top.

    Args:
        prediction: [U, >=top] ranked item ids (best first).
        targets: per-user iterable of relevant item ids.
    """
    tsets = _to_sets(targets)
    log = 1.0 / np.log2(np.arange(top) + 2)
    idcg_cum = log.cumsum()
    scores = np.empty(len(tsets), dtype=np.float64)
    for u, ts in enumerate(tsets):
        hits = np.fromiter(
            (1.0 if int(p) in ts else 0.0 for p in prediction[u, :top]),
            dtype=np.float64,
            count=top,
        )
        dcg = float(hits @ log)
        # Reference normalizer: ideal DCG of min(#gt, top) hits
        # (metrics.py:26). #gt is always >= 1 in the eval protocol.
        denom = idcg_cum[min(max(len(ts), 1), top) - 1]
        scores[u] = dcg / denom
    return float(scores.mean())


def get_recall(
    prediction: np.ndarray, targets: Sequence[Sequence[int]], top: int = 5
) -> float:
    """Recall@top = |pred[:top] ∩ gt| / |gt| averaged over users
    (metrics.py:29-37). Duplicate predictions collapse to a set, matching
    the reference's binarizer transform."""
    tsets = _to_sets(targets)
    scores = np.empty(len(tsets), dtype=np.float64)
    for u, ts in enumerate(tsets):
        pred = set(int(p) for p in prediction[u, :top])
        scores[u] = len(pred & ts) / max(len(ts), 1)
    return float(scores.mean())


def stable_sigmoid(x: np.ndarray) -> np.ndarray:
    """Overflow-free sigmoid for host-side postprocessing."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Binary ROC-AUC via the rank statistic, with tie-averaged ranks —
    numerically identical to sklearn.metrics.roc_auc_score (used by the
    reference at pmgt/pmgt/trainer.py:191 and dcn/trainer.py:205)."""
    labels = np.asarray(labels).astype(bool).ravel()
    scores = np.asarray(scores, dtype=np.float64).ravel()
    n_pos = int(labels.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        # Single-class eval batches are possible on tiny HPO splits; the
        # reference degrades to 0 rather than crashing (its ValueError →
        # NaN → 0 guard, dcn/trainer.py:200-209). Match that.
        import logging

        logging.getLogger("pmgt_tpu").warning(
            "roc_auc: only one class present (%d pos / %d neg); returning 0",
            n_pos,
            n_neg,
        )
        return 0.0
    order = np.argsort(scores, kind="mergesort")
    sorted_scores = scores[order]
    ranks = np.empty(labels.size, dtype=np.float64)
    # Average ranks over tie groups.
    i = 0
    while i < labels.size:
        j = i
        while j + 1 < labels.size and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    pos_rank_sum = ranks[labels].sum()
    return float((pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))
