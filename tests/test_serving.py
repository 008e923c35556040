"""Serving export (export_topk): full-catalog top-K recommendations.

Checks: shape/ordering contracts, training positives excluded, cold
users served, item-chunked scoring identical to single-chunk, and
brute-force agreement with direct model scoring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.data.interactions import InteractionData
from pmgt_tpu.tasks.ncf_task import NCFTask
from pmgt_tpu.tasks.dcn_task import DCNTask

NUM_USERS, NUM_ITEMS = 13, 17


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    pairs = []
    # user 5 is cold (never appears in train)
    for u in range(NUM_USERS):
        if u == 5:
            continue
        items = rng.choice(NUM_ITEMS, size=rng.integers(1, 6), replace=False)
        pairs.extend((u, i) for i in items)
    pairs = np.asarray(pairs, np.int32)
    return (
        InteractionData.build(pairs, NUM_USERS, NUM_ITEMS),
        InteractionData.build(pairs[:4], NUM_USERS, NUM_ITEMS),
        InteractionData.build(pairs[:4], NUM_USERS, NUM_ITEMS),
    )


def _ncf_task(data):
    args = TrainArgs(
        model_name="NeuMF-end",
        dataset_name="syn",
        seed=0,
        train_batch_size=8,
        test_batch_size=8,
        num_devices=1,
        extra=dict(factor_num=4, num_layers=2, num_ng=1),
    )
    return NCFTask(args, None, *data)


def test_export_topk_contract(data):
    task = _ncf_task(data)
    train = data[0]
    out = task.export_topk(task.state.params, k=5)
    assert out["item_ids"].shape == (NUM_USERS, 5)
    assert out["scores"].shape == (NUM_USERS, 5)
    assert (out["user_ids"] == np.arange(NUM_USERS)).all()
    # scores descending, item ids valid and unique per row
    assert (np.diff(out["scores"], axis=1) <= 1e-6).all()
    assert out["item_ids"].min() >= 0 and out["item_ids"].max() < NUM_ITEMS
    for row in out["item_ids"]:
        assert len(set(row.tolist())) == len(row)
    # training positives never served
    u_rows = {int(u): r for u, r in zip(train.unique_users, range(len(train.unique_users)))}
    for u in range(NUM_USERS):
        if u in u_rows:
            r = u_rows[u]
            seen = set(train.user_pos[r, : train.user_pos_count[r]].tolist())
            assert not seen & set(out["item_ids"][u].tolist())


def test_export_topk_matches_bruteforce(data):
    """Against direct dense scoring + numpy ranking (positives masked)."""
    task = _ncf_task(data)
    train = data[0]
    k = 4
    out = task.export_topk(task.state.params, k=k, item_chunk=7)
    users = np.repeat(np.arange(NUM_USERS), NUM_ITEMS).astype(np.int32)
    items = np.tile(np.arange(NUM_ITEMS), NUM_USERS).astype(np.int32)
    logits = np.array(
        task.model.apply(
            {"params": jax.device_get(task.state.params)},
            jnp.asarray(users),
            jnp.asarray(items),
            deterministic=True,
        ),
        dtype=np.float64,
    ).reshape(NUM_USERS, NUM_ITEMS)
    row_of = {int(u): r for r, u in enumerate(train.unique_users)}
    for u in range(NUM_USERS):
        if u in row_of:
            r = row_of[u]
            seen = train.user_pos[r, : train.user_pos_count[r]]
            logits[u, seen] = -np.inf
        expect = np.argsort(-logits[u], kind="stable")[:k]
        got = out["item_ids"][u]
        # compare by score (ties may reorder ids)
        np.testing.assert_allclose(
            np.sort(logits[u][expect]),
            np.sort(out["scores"][u]),
            rtol=1e-5,
            atol=1e-5,
        )
        assert set(got.tolist()) <= set(np.where(np.isfinite(logits[u]))[0].tolist())


def test_export_topk_chunked_equals_unchunked(data):
    task = _ncf_task(data)
    a = task.export_topk(task.state.params, k=6, item_chunk=NUM_ITEMS)
    b = task.export_topk(task.state.params, k=6, item_chunk=6)
    np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-6, atol=1e-6)
    assert (a["item_ids"] == b["item_ids"]).all()


def test_export_topk_include_seen(data):
    task = _ncf_task(data)
    train = data[0]
    out = task.export_topk(task.state.params, k=NUM_ITEMS, exclude_train=False)
    # with the full catalog requested and no exclusion, every row is a
    # permutation of the catalog
    for row in out["item_ids"]:
        assert sorted(row.tolist()) == list(range(NUM_ITEMS))


def test_export_topk_short_tail_marks_invalid_slots():
    """A user with fewer than k unseen items must get item_id -1 /
    score -inf tail slots — NOT their excluded training positives
    (the old finite -1e30 sentinel outranked the -inf merge-carry
    init and leaked positives into the tail)."""
    # user 0 has seen 15 of 17 items -> only 2 valid candidates for k=5
    pairs = np.asarray([(0, i) for i in range(15)] + [(1, 0)], np.int32)
    d = InteractionData.build(pairs, 2, NUM_ITEMS)
    task = _ncf_task((d, d, d))
    out = task.export_topk(task.state.params, k=5)
    row, sc = out["item_ids"][0], out["scores"][0]
    assert np.isfinite(sc[:2]).all()
    assert set(row[:2].tolist()) == {15, 16}  # the two unseen items
    assert (row[2:] == -1).all()
    assert np.isneginf(sc[2:]).all()


def test_export_topk_dcn(data):
    args = TrainArgs(
        model_name="DCN",
        dataset_name="syn",
        seed=0,
        train_batch_size=8,
        test_batch_size=8,
        num_devices=1,
        extra=dict(
            factor_num=4,
            deep_net_num_layers=2,
            cross_net_num_layers=2,
            num_ng=1,
        ),
    )
    task = DCNTask(args, None, *data)
    out = task.export_topk(task.state.params, k=5, item_chunk=8)
    assert out["item_ids"].shape == (NUM_USERS, 5)
    assert np.isfinite(out["scores"]).all()
    assert (np.diff(out["scores"], axis=1) <= 1e-6).all()
