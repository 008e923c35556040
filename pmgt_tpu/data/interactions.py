"""User-item interaction tables and the NCF/DCN sampling protocol.

Behavioral reference: pmgt/ncf/datasets.py. The reference keeps a scipy
``dok_matrix`` and rejection-samples negatives in a Python ``while`` loop
per pair (ncf/datasets.py:85-101), and builds per-user evaluation candidate
lists of all positives plus sampled negatives up to ``num_ng``
(ncf/datasets.py:106-128). Here the interaction set becomes a padded table
of **sorted** per-user positives, and negative sampling draws exactly from
the reference's limiting distribution — uniform over each row's complement
set — by order-statistics rank selection (``_complement_rank_select``):
one uniform per draw, fixed shapes, guaranteed termination, no rejection
rounds and no dense [users, items] membership matrix.

Membership is **split-local** on purpose: the reference checks candidate
negatives only against the split's own matrix (``train_mat`` built from the
split handed to the dataset, ncf/datasets.py:85-92), so eval negatives may
collide with *train* positives exactly as they do upstream.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

class InteractionData(NamedTuple):
    """Padded structure-of-arrays view of a (user, item) interaction split.

    ``user_pos`` rows are the per-user positive item ids (sorted, unique),
    padded with ``num_items`` — an id outside the item range so a padded
    slot can never match a sampled candidate.
    """

    pairs: np.ndarray  # [M, 2] int32 (user, item) as given
    num_users: int
    num_items: int
    unique_users: np.ndarray  # [U] int32, sorted
    user_pos: np.ndarray  # [U, max_pos] int32, padded with num_items
    user_pos_count: np.ndarray  # [U] int32

    @classmethod
    def build(
        cls, pairs: np.ndarray, num_users: int, num_items: int
    ) -> "InteractionData":
        pairs = np.asarray(pairs, np.int32).reshape(-1, 2)
        if len(pairs):
            # Loud on malformed artifacts: out-of-range ids would
            # otherwise surface as wrapped gathers or IndexErrors deep
            # inside sampling/serving.
            if pairs[:, 0].min() < 0 or pairs[:, 0].max() >= num_users:
                raise ValueError(
                    f"user ids in [{pairs[:, 0].min()}, {pairs[:, 0].max()}] "
                    f"outside [0, {num_users})"
                )
            if pairs[:, 1].min() < 0 or pairs[:, 1].max() >= num_items:
                raise ValueError(
                    f"item ids in [{pairs[:, 1].min()}, {pairs[:, 1].max()}] "
                    f"outside [0, {num_items})"
                )
            # One O(M log M) lexsort; per-user slices come from the sorted
            # run boundaries (no per-user rescans of the pair list).
            order = np.lexsort((pairs[:, 1], pairs[:, 0]))
            su, si = pairs[order, 0], pairs[order, 1]
            keep = np.ones(len(pairs), bool)
            keep[1:] = (su[1:] != su[:-1]) | (si[1:] != si[:-1])
            su, si = su[keep], si[keep]
            unique_users, starts = np.unique(su, return_index=True)
            bounds = np.append(starts, len(su))
            pos_count = np.diff(bounds).astype(np.int32)
            u = len(unique_users)
            max_pos = max(int(pos_count.max()), 1)
            user_pos = np.full((u, max_pos), num_items, np.int32)
            # Scatter sorted items into row-relative columns in one shot.
            cols = np.arange(len(su)) - np.repeat(starts, pos_count)
            rows = np.repeat(np.arange(u), pos_count)
            user_pos[rows, cols] = si
        else:
            unique_users = np.zeros((0,), np.int32)
            pos_count = np.zeros((0,), np.int32)
            user_pos = np.full((0, 1), num_items, np.int32)
        return cls(
            pairs=pairs,
            num_users=int(num_users),
            num_items=int(num_items),
            unique_users=unique_users.astype(np.int32),
            user_pos=user_pos,
            user_pos_count=pos_count,
        )

    def user_row_index(self) -> np.ndarray:
        """[num_users] int32: user id → row in ``user_pos`` (0 for users
        absent from this split; callers only index present users)."""
        idx = np.zeros((self.num_users,), np.int32)
        idx[self.unique_users] = np.arange(
            len(self.unique_users), dtype=np.int32
        )
        return idx


def _complement_rank_select(
    pair_rows: jnp.ndarray, rank: jnp.ndarray, num_items: int
) -> jnp.ndarray:
    """The rank-th smallest item NOT in the row's sorted positive set —
    the shared order-statistics walk (sampling/mcn.py
    ``complement_rank_select``) over [0, num_items); positives are sorted
    and distinct, pads are num_items."""
    from pmgt_tpu.sampling.mcn import complement_rank_select

    return complement_rank_select(pair_rows, rank, 0, num_items)


@partial(jax.jit, static_argnums=(3, 4))
def ng_sample(
    users: jnp.ndarray,
    pair_rows: jnp.ndarray,
    key: jax.Array,
    num_ng: int,
    num_items: int,
) -> jnp.ndarray:
    """Sample ``num_ng`` negative items per row, never colliding with that
    row's positives (reference ``ng_sample``, ncf/datasets.py:85-101).

    Args:
        users: [M] int32 user ids (shape carrier; membership comes from
            ``pair_rows``).
        pair_rows: [M, max_pos] **sorted** positive item ids per row
            (``InteractionData.user_pos`` rows), padded with ``num_items``.
        key: PRNG key.
        num_ng: negatives per row.
        num_items: item-id space size.

    Returns:
        [M, num_ng] int32 negative item ids, each an **exact** uniform
        draw over the row's complement set — the distribution the
        reference's unbounded rejection ``while`` converges to — computed
        directly by rank selection: pick a uniform rank in
        [0, num_items − #positives), then walk the sorted positives to
        the rank-th absent item (order statistics, O(max_pos) per draw).
        One uniform per draw (no rejection rounds, no retry tensor), so
        memory is O(M · num_ng) and full-protocol eval calls
        (num_ng=1000) scale to production splits. Degenerate rows whose
        positives cover the whole item space have no correct negative
        (the reference's ``while`` loop would never terminate); they emit
        a clamped id — callers detect them host-side via
        ``user_pos_count >= num_items``.
    """
    m = users.shape[0]
    n_pos = jnp.sum(pair_rows < num_items, axis=1, keepdims=True)
    comp = jnp.maximum(num_items - n_pos, 1)
    # Integer rank draw (randint broadcasts the per-row maxval): exact up
    # to ~comp/2^32 modulo bias. floor(float32_uniform * comp) would
    # quantize ranks onto a 2^23 grid — measurably non-uniform at
    # production item counts and unable to reach items past 8.4M.
    rank = jax.random.randint(key, (m, num_ng), 0, comp, dtype=jnp.int32)
    return _complement_rank_select(pair_rows, rank, num_items)


def _warn_degenerate_rows(data: InteractionData) -> None:
    """Host-side surfacing of the one case ``ng_sample`` cannot satisfy:
    a user whose positives cover the entire item space (the reference's
    rejection ``while`` would never terminate there either)."""
    n_bad = int((data.user_pos_count >= data.num_items).sum())
    if n_bad:
        import logging

        logging.getLogger("pmgt_tpu").warning(
            "%d user(s) interacted with every item — no valid negative "
            "exists for them; their 'negatives' are clamped positives",
            n_bad,
        )


def epoch_training_arrays(
    data: InteractionData, num_ng: int, key: jax.Array
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One epoch of pointwise training examples: every positive pair plus
    ``num_ng`` fresh negatives per pair (the reference resamples each epoch
    via ``on_train_epoch_start``, ncf/trainer.py:191-193).

    Returns (users, items, labels) host arrays of length M * (1 + num_ng),
    positives first, then each pair's negatives grouped per pair.
    """
    _warn_degenerate_rows(data)
    pairs = data.pairs
    m = len(pairs)
    users = pairs[:, 0]
    if m == 0 or num_ng == 0:
        return (
            users.astype(np.int32),
            pairs[:, 1].astype(np.int32),
            np.ones((m,), np.float32),
        )
    rows = data.user_pos[data.user_row_index()[users]]
    negs = np.asarray(
        ng_sample(
            jnp.asarray(users),
            jnp.asarray(rows),
            key,
            int(num_ng),
            data.num_items,
        )
    )
    out_users = np.concatenate([users, np.repeat(users, num_ng)]).astype(
        np.int32
    )
    out_items = np.concatenate([pairs[:, 1], negs.reshape(-1)]).astype(
        np.int32
    )
    out_labels = np.concatenate(
        [np.ones((m,), np.float32), np.zeros((m * num_ng,), np.float32)]
    )
    return out_users, out_items, out_labels


def build_eval_candidates(
    data: InteractionData,
    num_ng: int,
    key: jax.Array,
    reference_tiebreak: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-user ranking candidates: all of the user's positives first, then
    sampled negatives up to ``num_ng`` total candidates (reference
    ncf/datasets.py:106-128; ``num_ng`` is ``max_sample_items``). Users with
    more positives than ``num_ng`` keep them all and get no negatives —
    valid count = max(num_ng, #pos), exactly the reference's list length.

    Args:
        reference_tiebreak: when True, keep the reference's EXACT candidate
            layout — positives first, so top-k's low-index tie-break favors
            positives (reference ncf/trainer.py:213 + ncf/datasets.py:106-128).
            This reproduces the reference's optimistic scoring of tied
            candidates (a constant scorer ranks perfectly); use it only for
            ±1%-gate comparisons against published numbers, where the
            protocol must match the reference bit-for-bit. Default False
            applies the keyed per-row shuffle documented below.

    Returns:
        users: [U] int32 (the split's users, sorted).
        candidates: [U, L] int32, L = max over users of the valid count.
        cand_mask: [U, L] float32 — 1 on valid candidate slots.
        labels: [U, L] float32 — 1 on positive slots.
    """
    _warn_degenerate_rows(data)
    users = data.unique_users
    u = len(users)
    counts = data.user_pos_count.astype(np.int64)
    if u == 0:
        z = np.zeros((0, max(num_ng, 1)), np.float32)
        return users, z.astype(np.int32), z, z
    valid = np.maximum(num_ng, counts)
    big_l = int(valid.max())
    # Chunk the user axis so the [users, L] draw tensors (L is
    # max_sample_items=1000 in the NCF protocol) stay bounded at
    # production user counts. Chunks are padded to one fixed shape so
    # ng_sample compiles once.
    chunk = 4096
    if u <= chunk:
        negs = np.asarray(
            ng_sample(
                jnp.asarray(users),
                jnp.asarray(data.user_pos),
                key,
                big_l,
                data.num_items,
            )
        )
    else:
        # ONE device program (lax.map over chunks): the old host loop of
        # per-chunk jitted calls paid one tunnel round trip per chunk
        # (~33 serialized dispatch+fetch at a 134k-user split) — the
        # CLAUDE.md eval rule. Keys/rows/padding are identical to the
        # loop it replaced, so the drawn candidates are bit-identical.
        c = (u + chunk - 1) // chunk
        pad = c * chunk - u
        rows = data.user_pos
        if pad:
            rows = np.concatenate(
                [rows, np.full((pad,) + rows.shape[1:], data.num_items, np.int32)]
            )
        rows_c = jnp.asarray(rows.reshape(c, chunk, rows.shape[1]))
        keys = jax.random.split(key, c)

        def _one(args_):
            r, k = args_
            return ng_sample(
                jnp.zeros((chunk,), jnp.int32), r, k, big_l, data.num_items
            )

        negs = (
            np.asarray(jax.lax.map(_one, (rows_c, keys)))
            .reshape(c * chunk, big_l)[:u]
        )
    col = np.arange(big_l)[None, :]
    pos_padded = np.full((u, big_l), data.num_items, np.int32)
    pos_padded[:, : data.user_pos.shape[1]] = data.user_pos
    is_pos = col < counts[:, None]
    candidates = np.where(is_pos, pos_padded, negs).astype(np.int32)
    labels = is_pos.astype(np.float32)
    cand_mask = (col < valid[:, None]).astype(np.float32)
    if reference_tiebreak:
        return users, candidates, cand_mask, labels
    # Shuffle each row's valid slots (keyed, deterministic per split).
    # The reference scores candidate lists positives-FIRST and
    # torch.topk / lax.top_k break ties toward the lower index
    # (reference ncf/trainer.py:213 + ncf/datasets.py:106-128), so a
    # constant/saturated scorer — every candidate tied — "ranks" all
    # positives at the top and reports a PERFECT NDCG/recall. HPO
    # maximization then selects exactly such degenerate trials (observed
    # on TPU: an MLP trial with dead ReLU towers scored val/n20 = 1.0 at
    # epochs 0-1). A per-row permutation is a no-op for tie-free
    # rankings and gives tied scores their unbiased expectation instead
    # of the optimistic bound. Documented deviation (README).
    shuffle_seed = int(
        jax.random.randint(jax.random.fold_in(key, 1), (), 0, np.iinfo(np.int32).max)
    )
    rng = np.random.default_rng(shuffle_seed)
    for start in range(0, u, 8192):  # chunked: [U, L] can be 134k x 1000
        sl = slice(start, min(start + 8192, u))
        r = rng.random((sl.stop - sl.start, big_l), dtype=np.float32)
        r[cand_mask[sl] == 0] = np.inf  # padding keeps its tail position
        order = np.argsort(r, axis=1, kind="stable")
        candidates[sl] = np.take_along_axis(candidates[sl], order, axis=1)
        labels[sl] = np.take_along_axis(labels[sl], order, axis=1)
    return users, candidates, cand_mask, labels


def train_valid_split(
    pairs: np.ndarray, valid_size: float, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Random train/valid split of interaction pairs (reference
    ncf/trainer.py:53-60 via sklearn train_test_split)."""
    from sklearn.model_selection import train_test_split

    pairs = np.asarray(pairs, np.int32).reshape(-1, 2)
    if valid_size <= 0 or len(pairs) < 2:
        return pairs, pairs[:0]
    train, valid = train_test_split(
        pairs, test_size=valid_size, random_state=seed
    )
    return np.ascontiguousarray(train), np.ascontiguousarray(valid)
