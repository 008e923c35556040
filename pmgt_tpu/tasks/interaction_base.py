"""Shared plumbing for pointwise user-item workloads (NCF, DCN).

Covers what the reference duplicates across ncf/trainer.py and
dcn/trainer.py: split construction, per-epoch negative resampling
(ncf/trainer.py:191-193), the jitted BCE train step with optional gradient
accumulation and frozen-embedding masking, and batch iteration.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Any, Iterable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.core.mesh import (
    batch_sharding,
    gather_to_host,
    make_mesh,
    pad_to_multiple,
    put_along_data_axis,
    replicate_host,
    replicated,
)
from pmgt_tpu.data.interactions import InteractionData, epoch_training_arrays
from pmgt_tpu.models.pmgt import bce_with_logits
from pmgt_tpu.train.optim import make_optimizer

logger = logging.getLogger("pmgt_tpu")


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


def chunk_eval_inputs(mesh, chunk: int, arrays, pad_values=None):
    """Pad host arrays [n, ...] to whole chunks and device-put them as
    [C, chunk, ...] sharded along axis=1 — the fixed-shape input of a
    single-dispatch ``lax.map`` evaluation program. Per-chunk host
    dispatch pays one tunnel round trip per chunk (measured ~700
    dispatches ≈ 30 s per eval at TG scale); mapping over the chunk axis
    inside ONE program makes evaluation a single dispatch, and the
    returned device arrays can be cached across epochs (eval candidate
    draws are keyed per split, not per epoch, mirroring the reference's
    fixed ng_sample eval tables, ncf/datasets.py + dcn/trainer.py:76-78).

    ``pad_values`` optionally gives one fill value per array (default 0
    for all — id arrays whose padding must hit a sentinel row pass it
    explicitly, e.g. NUM_SPECIAL_NODES for PMGT node ids).

    Returns (n, chunk, device_arrays)."""
    chunk = pad_to_multiple(chunk, mesh.size)
    n = len(arrays[0])
    c = max((n + chunk - 1) // chunk, 1)
    if pad_values is None:
        pad_values = (0,) * len(arrays)
    out = []
    for a, fill in zip(arrays, pad_values):
        a = np.asarray(a)
        pad = c * chunk - n
        if pad:
            a = np.concatenate(
                [a, np.full((pad,) + a.shape[1:], fill, a.dtype)]
            )
        out.append(
            put_along_data_axis(
                mesh, a.reshape((c, chunk) + a.shape[1:]), axis=1
            )
        )
    return n, chunk, out


class ServingTopKMixin:
    """Full-catalog top-K recommendation export, shared by every
    (user, item)-scoring workload. Requires ``self.mesh``,
    ``self.train_data`` and a ``_serving_logits`` scorer (the default
    scores ``self.model`` directly; PMGT_NCF overrides it to run items
    through its encoder tower, passing its tables/ctx via ``extras`` so
    they stay jit parameters rather than embedded constants)."""

    def _serving_logits(self, params, users2d, items2d, extras):
        return self.model.apply(
            {"params": params}, users2d, items2d, deterministic=True
        )

    def _topk_chunk_impl(self, params, users, pos_rows, chunk_start, extras,
                         *, chunk_size: int, k: int, exclude: bool):
        """Local top-k of a [B] user batch against the item chunk
        [chunk_start, chunk_start + chunk_size): absolute item ids +
        scores. ``pos_rows`` [B, P] are the users' training positives
        (padded with num_items); with ``exclude`` they sink to -inf so
        served lists contain unseen items only — a finite sentinel
        (-1e30) would still outrank the -inf merge-carry init and leak
        excluded positives into the tail whenever a user has fewer than
        k unseen items. Items past the catalog end (fixed chunk shape)
        are masked to -inf too; export_topk marks every -inf slot with
        item id -1."""
        num_items = int(self.train_data.num_items)
        items = chunk_start + jnp.arange(chunk_size, dtype=jnp.int32)
        b = users.shape[0]
        u = jnp.broadcast_to(users[:, None], (b, chunk_size))
        it = jnp.broadcast_to(items[None, :], (b, chunk_size))
        logits = self._serving_logits(
            params,
            jnp.minimum(u, jnp.int32(max(self.train_data.num_users - 1, 0))),
            jnp.minimum(it, jnp.int32(num_items - 1)),
            extras,
        ).astype(jnp.float32)
        if exclude:
            rows = jnp.arange(b, dtype=jnp.int32)[:, None]
            idx = pos_rows - chunk_start
            # Positives outside this chunk (and the num_items padding)
            # must NOT scatter: negative indices WRAP NumPy-style in
            # .at[], so remap them to chunk_size, which is positive
            # out-of-bounds and dropped by mode="drop".
            idx = jnp.where(
                (idx >= 0) & (idx < chunk_size), idx, jnp.int32(chunk_size)
            )
            logits = logits.at[rows, idx].set(-jnp.inf, mode="drop")
        logits = jnp.where(items[None, :] < num_items, logits, -jnp.inf)
        scores, top_idx = jax.lax.top_k(logits, min(k, chunk_size))
        return jnp.take_along_axis(it, top_idx, axis=1), scores

    def _topk_all_impl(self, params, users_c, pos_c, extras, *,
                       chunk_size: int, k: int, exclude: bool,
                       num_chunks: int):
        """Full-catalog top-k as ONE program: ``lax.map`` over [C, B]
        user batches, ``lax.scan`` over catalog chunks inside, with the
        running top-k merged on device (carry entries precede the new
        chunk in the concat, so ties resolve to the earliest chunk —
        the same stable order the old host-side merge produced). The
        host double loop dispatched user_batches x item_chunks jitted
        calls (~4000 tunnel round trips for PMGT_NCF serving at TG
        scale); this is a single dispatch."""
        starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk_size

        def per_batch(batch):
            users, pos = batch

            def body(carry, start):
                ids, sc = self._topk_chunk_impl(
                    params, users, pos, start, extras,
                    chunk_size=chunk_size, k=k, exclude=exclude,
                )
                all_ids = jnp.concatenate([carry[0], ids], axis=1)
                all_sc = jnp.concatenate([carry[1], sc], axis=1)
                best_sc, idx = jax.lax.top_k(all_sc, k)
                return (
                    jnp.take_along_axis(all_ids, idx, axis=1),
                    best_sc,
                ), None

            init = (
                jnp.zeros((users.shape[0], k), jnp.int32),
                jnp.full((users.shape[0], k), -jnp.inf, jnp.float32),
            )
            (ids, sc), _ = jax.lax.scan(body, init, starts)
            return ids, sc

        return jax.lax.map(per_batch, (users_c, pos_c))

    def export_topk(
        self,
        params,
        k: int = 100,
        user_batch: int = 256,
        item_chunk: int = 8192,
        exclude_train: bool = True,
        extras=None,
    ) -> dict:
        """Batched full-catalog serving export: for every user id in
        [0, num_users), the ``k`` highest-scoring items, training
        positives excluded by default. Beyond the reference — its NCF/DCN
        wire no inference mode (train.py:322-324 only dispatches PMGT's)
        — but the natural production surface of a recommender: one
        MXU-batched scoring sweep per user batch, catalog chunked on
        device, per-chunk top-k merged on host. Returns
        {"user_ids": [U], "item_ids": [U, k], "scores": [U, k]}."""
        data = self.train_data
        num_items = int(data.num_items)
        num_users = int(data.num_users)
        k = min(k, num_items)
        # per-chunk top-k only stays lossless when a chunk can hold the
        # whole global top-k
        item_chunk = min(max(item_chunk, k), num_items)

        # Per-user positive rows; users absent from train (cold users)
        # get an all-padding row and full-catalog candidates.
        maxp = data.user_pos.shape[1]
        all_users = np.arange(num_users, dtype=np.int32)
        pos_all = np.full((num_users, max(maxp, 1)), num_items, np.int32)
        if maxp and len(data.unique_users):
            # user_pos rows are in sorted unique_users order, so this is
            # the whole user -> positives-row mapping in one scatter.
            pos_all[data.unique_users, :maxp] = data.user_pos

        if not hasattr(self, "_topk_all_fn"):
            self._topk_all_fn = jax.jit(
                self._topk_all_impl,
                static_argnames=("chunk_size", "k", "exclude", "num_chunks"),
            )
        params_dev = replicate_host(self.mesh, params)
        n_chunks = -(-num_items // item_chunk)
        n, _, (u_dev, pos_dev) = chunk_eval_inputs(
            self.mesh, min(user_batch, num_users), (all_users, pos_all)
        )
        ids, sc = self._topk_all_fn(
            params_dev,
            u_dev,
            pos_dev,
            extras,
            chunk_size=item_chunk,
            k=k,
            exclude=exclude_train,
            num_chunks=n_chunks,
        )
        item_ids = gather_to_host(ids).reshape(-1, k)[:n].astype(np.int32)
        scores = gather_to_host(sc).reshape(-1, k)[:n].astype(np.float32)
        # A -inf score slot means "no valid candidate" (the user has
        # fewer than k unseen items); its id is whichever excluded/pad
        # entry won the -inf tie — mark it unambiguously.
        item_ids = np.where(np.isneginf(scores), np.int32(-1), item_ids)
        return {
            "user_ids": all_users,
            "item_ids": item_ids,
            "scores": scores,
        }


class InteractionTaskBase(ServingTopKMixin):
    """Subclasses set ``self.model`` (a flax module scoring (user, item) →
    logit) and implement ``evaluate``."""

    # name of the embedding table to freeze when freeze_item_init_emb is
    # set (reference ncf/trainer.py:179, dcn/trainer.py:138).
    frozen_param: Optional[str] = None

    def __init__(
        self,
        args: TrainArgs,
        train_data: InteractionData,
        valid_data: InteractionData,
        test_data: InteractionData,
        trial=None,
    ):
        from pmgt_tpu.tasks.pmgt_task import configure_prng

        configure_prng(args)
        self.args = args
        self.train_data = train_data
        self.valid_data = valid_data
        self.test_data = test_data
        self.trial = trial
        self.mesh = make_mesh(args.num_devices)
        # Fail fast at init: a non-divisible batch would otherwise error
        # mid-epoch inside device_put (batch-dim sharding needs equal
        # shards per device). Mirrors PMGTTask's check.
        div = self.mesh.size * args.accumulation_step
        if args.train_batch_size % div:
            raise ValueError(
                f"train_batch_size {args.train_batch_size} must be divisible "
                f"by num_devices*accumulation ({self.mesh.size}*"
                f"{args.accumulation_step}); partial trailing batches are "
                f"dropped, so pick any multiple of {div}"
            )
        self._batch_sharding = batch_sharding(self.mesh)
        self._replicated = replicated(self.mesh)
        self.num_ng = args.extra.get("num_ng", 1)
        self._epoch_arrays: Optional[Tuple[np.ndarray, ...]] = None
        self._epoch_arrays_epoch: Optional[int] = None

    def finish_init(self, params) -> None:
        """Call after the subclass created the model and params."""
        args = self.args
        params = replicate_host(self.mesh, params)
        m = len(self.train_data.pairs) * (1 + self.num_ng)
        steps_per_epoch = max(m // args.train_batch_size, 1)
        freeze = (
            self.frozen_param
            if self.args.extra.get("freeze_item_init_emb")
            and self.args.extra.get("item_init_emb_path")
            else None
        )
        self.tx = make_optimizer(
            params,
            optim=args.optim,
            lr=args.lr,
            decay=args.decay,
            scheduler_type=args.scheduler_type,
            total_steps=steps_per_epoch * args.num_epochs,
            warmup_ratio=args.scheduler_warmup,
            gradient_max_norm=args.gradient_max_norm,
            frozen_names=(freeze,) if freeze else (),
        )
        self.state = TrainState(
            params, replicate_host(self.mesh, self.tx.init(params))
        )
        self._train_step_fn = jax.jit(
            partial(
                self._train_step_impl,
                accum=args.accumulation_step,
                freeze=freeze,
            ),
            static_argnames=("accum", "freeze"),
            donate_argnums=(0,),
        )
        self._score_fn = jax.jit(self._score_impl)
        # Whole-epoch scan runner (see pmgt_task.train_epoch).
        self.use_scan_epoch = bool(args.extra.get("scan_epoch", True))

        def _epoch_impl(state, users_all, items_all, labels_all, seed):
            # per-step keys derive in-program from the seed scalar: eager
            # key/split ops outside jit would serialize the pipelined
            # epoch dispatch through the tunnel (CLAUDE.md)
            keys = jax.random.split(
                jax.random.key(seed), users_all.shape[0]
            )

            def body(st, xs):
                u, i, l, k = xs
                st, metrics = self._train_step_impl(
                    st, u, i, l, k, args.accumulation_step, freeze
                )
                return st, metrics["loss"]

            return jax.lax.scan(
                body, state, (users_all, items_all, labels_all, keys)
            )

        # No donation: the engine's pipelined scan mode reads the
        # pre-epoch state after dispatch (eval/checkpoint/speculation).
        self._train_epoch_fn = jax.jit(_epoch_impl)

    # ------------------------------------------------------------------
    def _loss_fn(self, params, users, items, labels, key):
        logits = self.model.apply(
            {"params": params},
            users,
            items,
            deterministic=False,
            rngs={"dropout": key},
        )
        return jnp.mean(bce_with_logits(logits, labels))

    def _train_step_impl(
        self, state: TrainState, users, items, labels, key, accum: int, freeze
    ):
        def grads_of(u, i, l, k):
            return jax.value_and_grad(self._loss_fn)(state.params, u, i, l, k)

        if accum == 1:
            loss, grads = grads_of(users, items, labels, key)
        else:
            sh = (accum, -1)
            keys = jax.random.split(key, accum)

            def body(carry, xs):
                u, i, l, k = xs
                loss, grads = grads_of(u, i, l, k)
                acc_g, acc_l = carry
                return (jax.tree.map(jnp.add, acc_g, grads), acc_l + loss), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss), _ = jax.lax.scan(
                body,
                (zeros, 0.0),
                (
                    users.reshape(sh),
                    items.reshape(sh),
                    labels.reshape(sh),
                    keys,
                ),
            )
            inv = 1.0 / accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss * inv

        if freeze is not None:
            grads = dict(grads)
            grads[freeze] = jax.tree.map(jnp.zeros_like, grads[freeze])

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), {"loss": loss}

    def _score_impl(self, params, users, items):
        """Deterministic scoring (eval): logits for (user, item)."""
        return self.model.apply({"params": params}, users, items, deterministic=True)

    # ------------------------------------------------------------------
    # engine Task protocol
    # ------------------------------------------------------------------
    def on_epoch_start(self, epoch: int) -> None:
        key = jax.random.key(np.uint32(self.args.seed * 7_001 + epoch))
        users, items, labels = epoch_training_arrays(
            self.train_data, self.num_ng, key
        )
        rng = np.random.default_rng(self.args.seed * 11 + epoch)
        perm = rng.permutation(len(users))
        self._epoch_arrays = (users[perm], items[perm], labels[perm])
        self._epoch_arrays_epoch = epoch

    def _ensure_epoch_arrays(self, epoch: int) -> None:
        # Keyed on the epoch, not just presence: a caller that skips
        # on_epoch_start (or passes a different epoch than the last one
        # started) must get that epoch's negatives/shuffle, not a stale
        # previous epoch's data trained under the new epoch's scan seed.
        if self._epoch_arrays is None or self._epoch_arrays_epoch != epoch:
            self.on_epoch_start(epoch)

    def train_batches(self, epoch: int) -> Iterable[Any]:
        self._ensure_epoch_arrays(epoch)
        users, items, labels = self._epoch_arrays
        bs = self.args.train_batch_size
        n_full = len(users) // bs
        for i in range(n_full):
            sl = slice(i * bs, (i + 1) * bs)
            yield (
                put_along_data_axis(self.mesh, users[sl].astype(np.int32)),
                put_along_data_axis(self.mesh, items[sl].astype(np.int32)),
                put_along_data_axis(self.mesh, labels[sl]),
                jax.random.key(np.uint32(self.args.seed * 13 + epoch * 100_003 + i)),
            )

    def train_step(self, state, batch):
        users, items, labels, key = batch
        return self._train_step_fn(state, users, items, labels, key)

    def train_epoch(self, state, epoch: int):
        """Engine fast path: one lax.scan dispatch per epoch."""
        self._ensure_epoch_arrays(epoch)
        users, items, labels = self._epoch_arrays
        bs = self.args.train_batch_size
        n_full = len(users) // bs
        if n_full == 0:
            return state, np.zeros((0,), np.float32)
        cut = n_full * bs
        users_all = put_along_data_axis(
            self.mesh, users[:cut].astype(np.int32).reshape(n_full, bs), axis=1
        )
        items_all = put_along_data_axis(
            self.mesh, items[:cut].astype(np.int32).reshape(n_full, bs), axis=1
        )
        labels_all = put_along_data_axis(
            self.mesh, labels[:cut].astype(np.float32).reshape(n_full, bs), axis=1
        )
        seed = np.uint32(self.args.seed * 13 + epoch * 100_003)
        return self._train_epoch_fn(state, users_all, items_all, labels_all, seed)

    def should_prune(self, value: float, epoch: int) -> bool:
        if self.trial is None:
            return False
        self.trial.report(value, epoch)
        return bool(self.trial.should_prune())
