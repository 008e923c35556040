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


# Vectorized membership works on a padded [U, G] ground-truth matrix;
# chunk the [U, W, G] comparison tensor so huge splits stay bounded.
_USER_CHUNK = 65_536


def _hit_matrix(prediction: np.ndarray, tsets: list, top: int):
    """[U, W] 0/1 hits of prediction[:, :W] against per-user gt sets,
    with W = min(top, prediction width) — lists shorter than ``top``
    score what they have instead of crashing. Returns (hits, first,
    gt_sizes): ``first`` marks the first occurrence of each id within a
    row (recall's binarizer-dedup semantics)."""
    pred = np.asarray(prediction)[:, :top].astype(np.int64, copy=False)
    u, w = pred.shape
    g = max((len(t) for t in tsets), default=1) or 1
    gt = np.full((u, g), -1, np.int64)
    for i, ts in enumerate(tsets):
        if ts:
            gt[i, : len(ts)] = sorted(ts)
    hits = np.empty((u, w), np.float64)
    first = np.empty((u, w), bool)
    dup_mask = np.tril(np.ones((w, w), bool), -1)
    for s in range(0, u, _USER_CHUNK):
        p = pred[s : s + _USER_CHUNK]
        hits[s : s + _USER_CHUNK] = (
            (p[:, :, None] == gt[s : s + _USER_CHUNK, None, :]).any(-1)
        )
        first[s : s + _USER_CHUNK] = ~(
            (p[:, :, None] == p[:, None, :]) & dup_mask
        ).any(-1)
    gt_sizes = np.fromiter(
        (len(t) for t in tsets), np.int64, count=len(tsets)
    )
    return hits, first, gt_sizes


def get_ndcg(
    prediction: np.ndarray, targets: Sequence[Sequence[int]], top: int = 5
) -> float:
    """NDCG@top.

    Args:
        prediction: [U, >=1] ranked item ids (best first); lists
            narrower than ``top`` score their actual length.
        targets: per-user iterable of relevant item ids.

    Duplicate predicted ids each count at their position, exactly like
    the reference's per-position binarizer transform (metrics.py:23-25).
    """
    tsets = _to_sets(targets)
    log = 1.0 / np.log2(np.arange(top) + 2)
    idcg_cum = log.cumsum()
    hits, _, gt_sizes = _hit_matrix(prediction, tsets, top)
    dcg = hits @ log[: hits.shape[1]]
    # Reference normalizer: ideal DCG of min(#gt, top) hits
    # (metrics.py:26). #gt is always >= 1 in the eval protocol.
    denom = idcg_cum[np.minimum(np.maximum(gt_sizes, 1), top) - 1]
    return float((dcg / denom).mean())


def get_recall(
    prediction: np.ndarray, targets: Sequence[Sequence[int]], top: int = 5
) -> float:
    """Recall@top = |pred[:top] ∩ gt| / |gt| averaged over users
    (metrics.py:29-37). Duplicate predictions collapse, matching the
    reference's binarizer transform (only first occurrences count)."""
    tsets = _to_sets(targets)
    hits, first, gt_sizes = _hit_matrix(prediction, tsets, top)
    uniq_hits = (hits * first).sum(1)
    return float((uniq_hits / np.maximum(gt_sizes, 1)).mean())


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
    # Tie-averaged ranks, vectorized: group [i..j] of equal scores gets
    # rank 0.5*(i+j)+1 (identical to the interpreted two-pointer scan
    # this replaced — that loop was seconds of host time per eval at
    # production split sizes).
    n = labels.size
    starts_mask = np.r_[True, sorted_scores[1:] != sorted_scores[:-1]]
    group_start = np.flatnonzero(starts_mask)
    group_end = np.r_[group_start[1:], n]  # one past each group
    group_rank = 0.5 * (group_start + group_end - 1) + 1.0
    ranks = np.empty(n, dtype=np.float64)
    ranks[order] = group_rank[np.cumsum(starts_mask) - 1]
    pos_rank_sum = ranks[labels].sum()
    return float((pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))
