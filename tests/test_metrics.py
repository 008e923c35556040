"""Metric semantics tests — including parity with the reference's exact
formulas (pmgt/metrics.py:16-37) and sklearn's roc_auc_score."""
import numpy as np
import pytest

from pmgt_tpu.metrics.ranking import get_ndcg, get_recall, roc_auc, stable_sigmoid


def test_recall_hand_case():
    pred = np.array([[1, 2, 3], [4, 5, 6]])
    targets = [[1, 3, 9], [7]]
    # user0: 2/3 hits of 3 gt; user1: 0/1
    assert get_recall(pred, targets, top=3) == pytest.approx((2 / 3) / 2)


def test_recall_duplicates_collapse():
    # The reference binarizes predictions, so duplicates count once.
    pred = np.array([[1, 1, 2]])
    assert get_recall(pred, [[1, 2]], top=3) == pytest.approx(1.0)


def test_ndcg_perfect_ranking():
    pred = np.array([[3, 1, 2]])
    targets = [[3]]
    # dcg = 1/log2(2); idcg with min(1, top)=1 hit = 1/log2(2) → 1.0
    assert get_ndcg(pred, targets, top=3) == pytest.approx(1.0)


def test_ndcg_reference_normalizer():
    # Reference normalizer is ideal-DCG of min(#gt, top) hits
    # (metrics.py:26).
    log = 1.0 / np.log2(np.arange(3) + 2)
    pred = np.array([[9, 7, 8]])
    targets = [[7, 8]]  # hits at ranks 2 and 3
    dcg = log[1] + log[2]
    idcg = log[:2].sum()
    assert get_ndcg(pred, targets, top=3) == pytest.approx(dcg / idcg)


def test_ndcg_matches_reference_implementation():
    """Cross-check against a direct port of the reference formula using
    sklearn's MultiLabelBinarizer (the reference's own machinery)."""
    from scipy.sparse import csr_matrix
    from sklearn.preprocessing import MultiLabelBinarizer

    rng = np.random.default_rng(0)
    num_items = 30
    pred = np.stack([rng.permutation(num_items)[:10] for _ in range(8)])
    targets = [
        list(rng.choice(num_items, size=rng.integers(1, 6), replace=False))
        for _ in range(8)
    ]

    def reference_ndcg(prediction, target_lists, top):
        mlb = MultiLabelBinarizer(
            sparse_output=True, classes=np.arange(num_items)
        ).fit(target_lists)
        targets_csr = mlb.transform(target_lists)
        log = 1.0 / np.log2(np.arange(top) + 2)
        dcg = np.zeros((targets_csr.shape[0], 1))
        for i in range(top):
            p = mlb.transform(prediction[:, i : i + 1])
            dcg += p.multiply(targets_csr).sum(axis=-1) * log[i]
        denom = log.cumsum()[np.minimum(targets_csr.sum(axis=-1), top) - 1]
        return np.average(dcg / denom)

    def reference_recall(prediction, target_lists, top):
        mlb = MultiLabelBinarizer(
            sparse_output=True, classes=np.arange(num_items)
        ).fit(target_lists)
        targets_csr = mlb.transform(target_lists)
        p = mlb.transform(prediction[:, :top])
        return (
            p.multiply(targets_csr).sum(axis=-1) / targets_csr.sum(axis=-1)
        ).mean()

    for top in (5, 10):
        assert get_ndcg(pred, targets, top=top) == pytest.approx(
            reference_ndcg(pred, targets, top)
        )
        assert get_recall(pred, targets, top=top) == pytest.approx(
            reference_recall(pred, targets, top)
        )


def test_roc_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(1)
    labels = rng.integers(0, 2, size=500)
    labels[0], labels[1] = 0, 1  # ensure both classes
    scores = rng.normal(size=500)
    # inject ties
    scores[::7] = 0.5
    assert roc_auc(labels, scores) == pytest.approx(
        roc_auc_score(labels, scores)
    )


def test_roc_auc_simple():
    assert roc_auc([0, 0, 1, 1], [0.1, 0.4, 0.35, 0.8]) == pytest.approx(0.75)


def test_stable_sigmoid_no_overflow():
    x = np.array([-1000.0, -10.0, 0.0, 10.0, 1000.0])
    s = stable_sigmoid(x)
    assert np.all(np.isfinite(s))
    assert s[0] == pytest.approx(0.0)
    assert s[2] == pytest.approx(0.5)
    assert s[4] == pytest.approx(1.0)


def test_roc_auc_single_class_degrades_to_zero():
    """Single-class batches (tiny HPO splits) must not crash — the
    reference's NaN->0 guard (dcn/trainer.py:200-209) degrades to 0."""
    assert roc_auc(np.ones(4), np.linspace(0, 1, 4)) == 0.0
    assert roc_auc(np.zeros(4), np.linspace(0, 1, 4)) == 0.0


def test_metrics_accept_prediction_narrower_than_top():
    """max_sample_items < k configs emit candidate lists narrower than
    the metric's top: score the actual length instead of crashing (the
    old np.fromiter(count=top) raised 'iterator too short'; the
    reference degrades gracefully through its binarizer transform)."""
    pred = np.array([[3, 1], [2, 9]])  # width 2, top 20
    targets = [[3], [7]]
    n = get_ndcg(pred, targets, top=20)
    r = get_recall(pred, targets, top=20)
    assert n == pytest.approx(0.5)  # user 0: hit at rank 1; user 1: miss
    assert r == pytest.approx(0.5)


def test_roc_auc_tie_heavy_matches_sklearn():
    """The vectorized tie-averaged ranks must stay numerically identical
    to sklearn on tie-heavy scores (constant scorers, quantized logits)."""
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(3)
    labels = rng.integers(0, 2, size=500).astype(float)
    scores = np.round(rng.normal(size=500), 1)  # heavy ties
    assert roc_auc(labels, scores) == pytest.approx(
        roc_auc_score(labels, scores), abs=1e-12
    )
    const = np.full(500, 0.5)
    assert roc_auc(labels, const) == pytest.approx(0.5)
