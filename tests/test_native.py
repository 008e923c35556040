"""Native C++ alias builder vs the Python implementation."""
import numpy as np
import pytest

from pmgt_tpu.native import build_alias_tables_native


def _python_alias(nbr_logits, degrees):
    """Direct Vose implementation (mirrors graph/container.py fallback)."""
    n, d = nbr_logits.shape
    alias_prob = np.ones((n, d), np.float32)
    alias_idx = np.zeros((n, d), np.int32)
    for row in range(n):
        deg = int(degrees[row])
        if deg <= 1:
            continue
        w = nbr_logits[row, :deg].astype(np.float64)
        p = np.exp(w - w.max())
        p /= p.sum()
        scaled = p * deg
        small = [j for j in range(deg) if scaled[j] < 1.0]
        large = [j for j in range(deg) if scaled[j] >= 1.0]
        prob = np.ones(deg)
        idx = np.zeros(deg, np.int32)
        while small and large:
            s = small.pop()
            l = large.pop()
            prob[s] = scaled[s]
            idx[s] = l
            scaled[l] = scaled[l] - (1.0 - scaled[s])
            (small if scaled[l] < 1.0 else large).append(l)
        alias_prob[row, :deg] = prob
        alias_idx[row, :deg] = idx
    return alias_prob, alias_idx


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(0)
    n, d = 50, 12
    degrees = rng.integers(0, d + 1, size=n).astype(np.int32)
    logits = np.full((n, d), -np.inf, np.float32)
    for r in range(n):
        logits[r, : degrees[r]] = rng.uniform(0.1, 3.0, degrees[r])
    return logits, degrees


def test_native_builds(table):
    logits, degrees = table
    out = build_alias_tables_native(logits, degrees)
    if out is None:
        pytest.skip("native builder unavailable (no compiler)")
    prob, idx = out
    assert prob.shape == logits.shape
    assert ((prob >= 0) & (prob <= 1.0 + 1e-6)).all()
    # alias indices stay within each row's degree
    for r in range(len(degrees)):
        deg = int(degrees[r])
        if deg:
            assert (idx[r, :deg] < deg).all()


def test_native_distribution_matches_softmax(table):
    """Alias tables must reproduce softmax(weights): the induced marginal
    p(j) = (prob[j] + sum_{k: idx[k]=j} (1-prob[k])) / deg."""
    logits, degrees = table
    out = build_alias_tables_native(logits, degrees)
    if out is None:
        pytest.skip("native builder unavailable")
    prob, idx = out
    for r in range(len(degrees)):
        deg = int(degrees[r])
        if deg < 2:
            continue
        w = logits[r, :deg].astype(np.float64)
        expected = np.exp(w - w.max())
        expected /= expected.sum()
        marginal = prob[r, :deg].astype(np.float64).copy()
        for k in range(deg):
            marginal[idx[r, k]] += 1.0 - prob[r, k]
        marginal /= deg
        np.testing.assert_allclose(marginal, expected, atol=1e-6)


def test_native_matches_python_marginals(table):
    logits, degrees = table
    out = build_alias_tables_native(logits, degrees)
    if out is None:
        pytest.skip("native builder unavailable")
    n_prob, n_idx = out
    p_prob, p_idx = _python_alias(logits, degrees)
    # The decompositions may differ (stack order) but induced marginals
    # must agree.
    for r in range(len(degrees)):
        deg = int(degrees[r])
        if deg < 2:
            continue

        def marg(prob, idx):
            m = prob[r, :deg].astype(np.float64).copy()
            for k in range(deg):
                m[idx[r, k]] += 1.0 - prob[r, k]
            return m / deg

        np.testing.assert_allclose(
            marg(n_prob, n_idx), marg(p_prob, p_idx), atol=1e-6
        )


def test_co_review_native_matches_scipy():
    """Native hash-counting co-review builder ≡ the scipy sparse matmul."""
    import scipy.sparse as sp

    from pmgt_tpu.native import co_review_edges_native

    rs = np.random.RandomState(7)
    m, n_items, n_users = 4000, 120, 60
    items = rs.randint(0, n_items, m).astype(np.int32)
    users = rs.randint(0, n_users, m).astype(np.int32)

    native = co_review_edges_native(items, users, min_common=3)
    if native is None:
        import pytest

        pytest.skip("no C++ toolchain")
    src, dst, counts = native
    assert (src < dst).all()

    # dedup like the pipeline does
    uniq = np.unique(np.stack([items, users], 1), axis=0)
    mat = sp.csr_matrix(
        (np.ones(len(uniq), np.int32), (uniq[:, 0], uniq[:, 1])),
        shape=(n_items, n_users),
    )
    common = (mat @ mat.T).tocoo()
    expected = {
        (int(i), int(j)): int(w)
        for i, j, w in zip(common.row, common.col, common.data)
        if i < j and w >= 3
    }
    got = {
        (int(i), int(j)): int(c) for i, j, c in zip(src, dst, counts)
    }
    assert got == expected
    assert len(got) > 50  # the workload actually produced edges


def test_co_review_native_max_pairs_fallback():
    from pmgt_tpu.native import co_review_edges_native

    items = np.arange(100, dtype=np.int32)
    users = np.zeros(100, np.int32)  # one user, 4950 pairs
    assert co_review_edges_native(items, users, 1, max_pairs=100) is None
