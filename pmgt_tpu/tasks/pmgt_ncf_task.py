"""PMGT_NCF workload: end-to-end NCF with a PMGT item tower.

The reference implements the model and dataset but never wires a trainer
(SURVEY.md §2.2: no pmgt_ncf/trainer.py; reference train.py:306 dispatches
only ncf/pmgt/dcn). Here it is a complete workload: ``train-pmgt-ncf``
with the same ranking evaluation protocol as NCF.

Item neighborhoods come from the per-epoch context cache (one fresh
context per item per epoch); the item id ↔ node id mapping follows the
reference's convention (item idx + 2, pmgt_ncf/datasets.py:62-67) when the
item and node encoders coincide, with an explicit classes-based remap
otherwise.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pmgt_tpu.core.config import (
    PMGTConfig,
    SamplingConfig,
    TrainArgs,
    resolve_fusion_strategy,
)
from pmgt_tpu.core.mesh import (
    batch_sharding,
    gather_to_host,
    make_mesh,
    place_graph,
    put_along_data_axis,
    replicate_host,
    replicated,
)
from pmgt_tpu.core.quant import prepare_feat_tables
from pmgt_tpu.data.artifacts import load_artifacts
from pmgt_tpu.data.interactions import (
    InteractionData,
    build_eval_candidates,
    epoch_training_arrays,
    train_valid_split,
)
from pmgt_tpu.graph.container import NUM_SPECIAL_NODES, PaddedGraph
from pmgt_tpu.metrics.ranking import get_ndcg, get_recall
from pmgt_tpu.models.pmgt import bce_with_logits
from pmgt_tpu.models.pmgt_ncf import PMGT_NCF
from pmgt_tpu.sampling.pairs import (
    effective_refresh_chunk,
    sample_all_contexts,
)
from pmgt_tpu.tasks.interaction_base import (
    ServingTopKMixin,
    TrainState,
    chunk_eval_inputs,
)
from pmgt_tpu.train import engine
from pmgt_tpu.train.checkpoints import restore_checkpoint
from pmgt_tpu.train.registry import locate_eval_ckpt

logger = logging.getLogger("pmgt_tpu")


def _default_attention_impl() -> str:
    """Pallas kernels are the measured-faster path on TPU (+11% sustained
    training throughput); elsewhere they only run interpreted, so default
    to the XLA formulation."""
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"

TOPK = 100


def _item_to_node_map(artifacts) -> np.ndarray:
    """item idx → node id. Uses the reference's +2 convention when the
    encoders coincide; otherwise remaps via label classes (items missing
    from the graph map to <pad> and encode as bare sequences)."""
    ni = artifacts.num_items
    if artifacts.item_classes is None or artifacts.node_classes is None or (
        len(artifacts.item_classes) == len(artifacts.node_classes)
        and (
            np.asarray(artifacts.item_classes)
            == np.asarray(artifacts.node_classes)
        ).all()
    ):
        return np.arange(
            NUM_SPECIAL_NODES, ni + NUM_SPECIAL_NODES, dtype=np.int32
        )
    node_idx = {
        label: i + NUM_SPECIAL_NODES
        for i, label in enumerate(np.asarray(artifacts.node_classes).tolist())
    }
    return np.asarray(
        [
            node_idx.get(label, 0)
            for label in np.asarray(artifacts.item_classes).tolist()
        ],
        np.int32,
    )


class PMGTNCFTask(ServingTopKMixin):
    def __init__(
        self, args, artifacts, train_data, valid_data, test_data, trial=None
    ):
        from pmgt_tpu.tasks.pmgt_task import configure_prng

        configure_prng(args)
        self.args = args
        self.artifacts = artifacts
        self.train_data = train_data
        self.valid_data = valid_data
        self.test_data = test_data
        self.trial = trial
        self.mesh = make_mesh(args.num_devices)
        # Fail fast at init: a non-divisible batch would otherwise error
        # mid-epoch inside device_put (batch-dim sharding needs equal
        # shards per device). Mirrors InteractionTaskBase's check.
        if args.train_batch_size % self.mesh.size:
            raise ValueError(
                f"train_batch_size {args.train_batch_size} must be "
                f"divisible by mesh size {self.mesh.size}"
            )
        self._batch_sharding = batch_sharding(self.mesh)
        self._replicated = replicated(self.mesh)
        self.num_ng = args.extra.get("num_ng", 1)

        e = args.extra
        feat_dims = tuple(int(t.shape[-1]) for t in artifacts.feat_init_embs)
        self.config = PMGTConfig(
            hidden_size=e.get("hidden_size", 128),
            feat_hidden_sizes=feat_dims,
            intermediate_size=e.get("intermediate_size", 128),
            num_hidden_layers=e.get("num_hidden_layers", 5),
            num_attention_heads=e.get("num_attention_heads", 1),
            beta=e.get("beta", 0.5),
            attention_impl=e.get("attention_impl") or _default_attention_impl(),
            dtype="bfloat16" if args.mp_enabled else "float32",
            fusion_strategy=resolve_fusion_strategy(
                e.get("fusion_strategy"), artifacts.num_nodes
            ),
        )
        self.sampling = SamplingConfig(
            max_ctx_neigh=e.get("max_ctx_neigh", 5),
            hop_sampling_sizes=tuple(e.get("hop_sampling_sizes", (16, 8, 4))),
            # True row count, pre-placement (--shard-graph-tables pads).
            num_total=artifacts.graph.num_total,
        )
        self.model = PMGT_NCF(
            user_num=train_data.num_users,
            item_num=train_data.num_items,
            config=self.config,
            factor_num=e.get("factor_num", 32),
            num_layers=e.get("num_layers", 3),
            emb_dropout=e.get("emb_dropout", 0.0),
            dropout=e.get("dropout", 0.0),
            model=args.model_name,
        )

        # runtime_view drops build-only arrays before device placement;
        # --shard-graph-tables row-shards the per-node tables over the
        # mesh (core/mesh.place_graph).
        self.graph = place_graph(
            self.mesh,
            artifacts.graph.runtime_view(),
            shard=bool(args.extra.get("shard_graph_tables")),
        )
        # Same storage levers as the PMGT task (float32/bfloat16/int8;
        # bf16 is bit-same under the bf16 compute policy, so it is the
        # default when mp is on).
        self.feat_tables = prepare_feat_tables(
            artifacts.feat_init_embs,
            str(
                e.get("feat_tables_dtype")
                or ("bfloat16" if args.mp_enabled else "float32")
            ),
            self.mesh,
            shard=bool(e.get("shard_feat_tables")),
        )
        self.item_to_node = replicate_host(self.mesh, _item_to_node_map(artifacts))

        s = self.sampling.seq_len
        params = jax.jit(
            partial(self.model.init, deterministic=True)
        )(
            {"params": jax.random.key(args.seed)},
            self.feat_tables,
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, s), jnp.int32),
            jnp.ones((2, s), jnp.float32),
        )["params"]
        params = replicate_host(self.mesh, params)

        from pmgt_tpu.train.optim import make_optimizer

        m = len(train_data.pairs) * (1 + self.num_ng)
        steps = max(m // args.train_batch_size, 1)
        self.tx = make_optimizer(
            params,
            optim=args.optim,
            lr=args.lr,
            decay=args.decay,
            scheduler_type=args.scheduler_type,
            total_steps=steps * args.num_epochs,
            warmup_ratio=args.scheduler_warmup,
            gradient_max_norm=args.gradient_max_norm,
        )
        self.state = TrainState(
            params, replicate_host(self.mesh, self.tx.init(params))
        )

        n_total = self.sampling.num_total  # true rows (placed may be padded)
        self._all_nodes = replicate_host(
            self.mesh, np.arange(n_total, dtype=np.int32)
        )
        # Same HBM-pressure-aware refresh chunk as the PMGT task.
        import os as _os

        hbm = int(_os.environ.get("PMGT_TPU_HBM_BYTES", 16 << 30))
        persistent = sum(
            l.addressable_shards[0].data.nbytes
            for l in jax.tree.leaves((self.feat_tables, self.graph))
        )
        refresh_chunk = effective_refresh_chunk(
            self.graph, self.sampling,
            max(hbm - (3 << 30) - persistent, 0),
        )
        self._sample_all_fn = jax.jit(
            lambda graph, nodes, key: sample_all_contexts(
                graph, key, self.sampling, n_total, all_nodes=nodes,
                chunk=refresh_chunk,
            )
        )
        self._ctx_cache = None
        self._eval_ctx_cache = None
        self._train_step_fn = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._rank_fn = jax.jit(self._rank_impl)
        self._eval_fn = jax.jit(self._eval_impl)
        self._eval_cache: Dict[str, Any] = {}
        self._epoch_arrays: Optional[Tuple[np.ndarray, ...]] = None

        # Whole-epoch scan runner (see pmgt_task.train_epoch).
        self.use_scan_epoch = bool(e.get("scan_epoch", True))

        def _epoch_impl(state, feat_tables, users_all, items_all,
                        labels_all, seed, ctx):
            # per-step keys derive in-program (eager key ops would
            # serialize the pipelined dispatch, CLAUDE.md)
            keys = jax.random.split(
                jax.random.key(seed), users_all.shape[0]
            )

            def body(st, xs):
                u, i, l, k = xs
                st, metrics = self._train_step_impl(
                    st, feat_tables, u, i, l, k, ctx
                )
                return st, metrics["loss"]

            return jax.lax.scan(
                body, state, (users_all, items_all, labels_all, keys)
            )

        # No donation: the engine's pipelined scan mode reads the
        # pre-epoch state after dispatch (eval/checkpoint/speculation).
        self._train_epoch_fn = jax.jit(_epoch_impl)

    # ------------------------------------------------------------------
    def _item_seqs(self, items, ctx):
        nodes = self.item_to_node[items]
        return ctx[0][nodes], ctx[1][nodes]

    def _get_eval_ctx(self):
        """Deterministic per-run context draw for evaluation/serving —
        independent of the training schedule, so val metrics are a pure
        function of the params. Evaluating with ``self._ctx_cache``
        would read whatever epoch the engine last STARTED: its
        pipelined scan mode speculatively dispatches epoch k+1 (and
        with it on_epoch_start(k+1)) before evaluating epoch k, which
        would silently score epoch k's params under epoch k+1's
        contexts — and leave the final, non-speculated epoch scored
        under its own. A fixed-seed draw makes every eval (and a
        restored checkpoint's serving export) consistent."""
        if self._eval_ctx_cache is None:
            # fold_in (a hash, not an additive offset) keeps this stream
            # distinct from every training epoch's key(seed*55_001+epoch)
            # for ALL seeds/epochs — at seed=0 a bare seed*99_991 would
            # collide with epoch 0's draw.
            self._eval_ctx_cache = self._sample_all_fn(
                self.graph,
                self._all_nodes,
                jax.random.fold_in(
                    jax.random.key(np.uint32(self.args.seed)), 0xE7A1
                ),
            )
        return self._eval_ctx_cache

    def _serving_logits(self, params, users2d, items2d, extras):
        """ServingTopKMixin scorer: items go through the PMGT encoder
        tower over their cached context sequences. feat_tables/ctx enter
        via ``extras`` so they stay jit parameters (embedded constants
        would scale the compile payload with the graph and defeat
        sharding annotations)."""
        feat_tables, ctx = extras
        shape = users2d.shape
        items = items2d.reshape(-1)
        seqs, mask = self._item_seqs(items, ctx)
        return self.model.apply(
            {"params": params},
            feat_tables,
            users2d.reshape(-1),
            seqs,
            mask,
            item=items,
            deterministic=True,
        ).reshape(shape)

    def _train_step_impl(self, state, feat_tables, users, items, labels,
                         key, ctx):
        # feat_tables enter as a jit parameter, not via closure:
        # closure-captured arrays become literal constants in the lowered
        # module, scaling the compile payload with the graph (see
        # pmgt_task._train_step_impl).
        def loss_fn(params):
            seqs, mask = self._item_seqs(items, ctx)
            logits = self.model.apply(
                {"params": params},
                feat_tables,
                users,
                seqs,
                mask,
                item=items,
                deterministic=False,
                rngs={"dropout": key},
            )
            return jnp.mean(bce_with_logits(logits, labels))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), {"loss": loss}

    def _rank_impl(self, params, feat_tables, users, candidates,
                   cand_mask, ctx):
        b, l = candidates.shape
        u = jnp.broadcast_to(users[:, None], candidates.shape).reshape(-1)
        seqs, mask = self._item_seqs(candidates.reshape(-1), ctx)
        logits = self.model.apply(
            {"params": params},
            feat_tables,
            u,
            seqs,
            mask,
            item=candidates.reshape(-1),
            deterministic=True,
        ).reshape(b, l)
        neg_inf = jnp.finfo(logits.dtype).min
        masked = jnp.where(cand_mask > 0, logits, neg_inf)
        _, top_idx = jax.lax.top_k(masked, min(TOPK, l))
        return jnp.take_along_axis(candidates, top_idx, axis=1), logits

    def _eval_impl(self, params, feat_tables, ctx, users_c, cand_c,
                   mask_c, labels_c):
        """Whole-split evaluation as ONE program: ``lax.map`` over
        [C, chunk] user chunks (one device dispatch instead of one per
        chunk — each host dispatch pays a tunnel round trip). Returns
        per-user top-k items plus per-chunk masked-BCE sums/counts, the
        same mean-of-per-chunk-means the chunked host loop computed
        (padding rows carry mask 0, so they contribute nothing)."""

        def one(chunk):
            u, c, m, lb = chunk
            top_items, logits = self._rank_impl(
                params, feat_tables, u, c, m, ctx
            )
            bce = (
                jnp.maximum(logits, 0)
                - logits * lb
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            return top_items, (bce * m).sum(), m.sum()

        return jax.lax.map(one, (users_c, cand_c, mask_c, labels_c))

    # ------------------------------------------------------------------
    # engine Task protocol
    # ------------------------------------------------------------------
    def on_epoch_start(self, epoch: int) -> None:
        self._ctx_cache = self._sample_all_fn(
            self.graph,
            self._all_nodes,
            jax.random.key(np.uint32(self.args.seed * 55_001 + epoch)),
        )
        key = jax.random.key(np.uint32(self.args.seed * 7_001 + epoch))
        users, items, labels = epoch_training_arrays(
            self.train_data, self.num_ng, key
        )
        rng = np.random.default_rng(self.args.seed * 11 + epoch)
        perm = rng.permutation(len(users))
        self._epoch_arrays = (users[perm], items[perm], labels[perm])

    def train_batches(self, epoch: int):
        if self._epoch_arrays is None:
            self.on_epoch_start(epoch)
        users, items, labels = self._epoch_arrays
        bs = self.args.train_batch_size
        for i in range(len(users) // bs):
            sl = slice(i * bs, (i + 1) * bs)
            yield (
                put_along_data_axis(self.mesh, users[sl].astype(np.int32)),
                put_along_data_axis(self.mesh, items[sl].astype(np.int32)),
                put_along_data_axis(self.mesh, labels[sl]),
                jax.random.key(
                    np.uint32(self.args.seed * 13 + epoch * 100_003 + i)
                ),
            )

    def train_step(self, state, batch):
        if self._ctx_cache is None:
            self.on_epoch_start(0)
        users, items, labels, key = batch
        return self._train_step_fn(
            state, self.feat_tables, users, items, labels, key,
            self._ctx_cache
        )

    def train_epoch(self, state, epoch: int):
        """Engine fast path: one lax.scan dispatch per epoch."""
        if self._epoch_arrays is None or self._ctx_cache is None:
            self.on_epoch_start(epoch)
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
        return self._train_epoch_fn(
            state, self.feat_tables, users_all, items_all, labels_all,
            seed, self._ctx_cache
        )

    def evaluate(self, state, split: str = "valid") -> Dict[str, float]:
        params = state.params if isinstance(state, TrainState) else state
        data = self.valid_data if split == "valid" else self.test_data
        ctx = self._get_eval_ctx()
        if split not in self._eval_cache:
            key = jax.random.key(
                np.uint32(self.args.seed * 17 + (split == "test"))
            )
            users, candidates, cand_mask, labels = build_eval_candidates(
                data,
                self.args.extra.get("max_sample_items", 1000),
                key,
                reference_tiebreak=bool(
                    self.args.extra.get("reference_tiebreak", False)
                ),
            )
            n, _, dev = chunk_eval_inputs(
                self.mesh,
                max(self.args.test_batch_size // 64, self.mesh.size),
                (
                    users.astype(np.int32),
                    candidates.astype(np.int32),
                    cand_mask.astype(np.float32),
                    labels.astype(np.float32),
                ),
            )
            # The candidate draw is keyed per split (NOT per epoch), so
            # the device tensors are reusable across every eval of a run.
            self._eval_cache[split] = (n, dev)
        n, dev = self._eval_cache[split]
        top_items, loss_sums, mask_cnts = self._eval_fn(
            replicate_host(self.mesh, params), self.feat_tables, ctx, *dev
        )
        prediction = gather_to_host(top_items).reshape(
            -1, top_items.shape[-1]
        )[:n]
        sums = gather_to_host(loss_sums)
        cnts = gather_to_host(mask_cnts)
        losses = sums / np.maximum(cnts, 1)

        gt_sets = [
            data.user_pos[r, : data.user_pos_count[r]].tolist()
            for r in range(n)
        ]
        prefix = "val" if split == "valid" else "test"
        results = {f"{prefix}/loss": float(np.mean(losses))}
        ks = (20,) if split == "valid" else (10, 20)
        for k in ks:
            results[f"{prefix}/n{k}"] = get_ndcg(prediction, gt_sets, top=k)
            results[f"{prefix}/r{k}"] = get_recall(prediction, gt_sets, top=k)
        return results

    def should_prune(self, value: float, epoch: int) -> bool:
        if self.trial is None:
            return False
        self.trial.report(value, epoch)
        return bool(self.trial.should_prune())


# ----------------------------------------------------------------------
# 7-function workload contract
# ----------------------------------------------------------------------

def check_args(args: TrainArgs) -> None:
    if args.early_criterion not in ("loss", "n20", "r20"):
        raise ValueError(f"invalid early_criterion {args.early_criterion}")
    if args.model_name not in ("MLP", "NeuMF-end"):
        raise ValueError(f"invalid model_name {args.model_name}")
    # Without a run to restore, eval/inference would score freshly
    # initialized params (nothing is trained in these modes). Mirrors
    # pmgt_task.check_args / reference base_trainer.py:99-110.
    if args.mode in ("eval", "inference") and args.run_id is None:
        raise ValueError(f"mode {args.mode} requires --run-id")


def init_run(args: TrainArgs) -> None:
    np.random.seed(args.seed)


def init_dataloader(args: TrainArgs, ctx: Dict[str, Any]) -> None:
    artifacts = ctx.get("artifacts") or load_artifacts(
        args.data_dir, args.dataset_name
    )
    ctx["artifacts"] = artifacts
    train_pairs, valid_pairs = train_valid_split(
        artifacts.train_pairs, args.valid_size, args.seed
    )
    nu, ni = artifacts.num_users, artifacts.num_items
    ctx["train_data"] = InteractionData.build(train_pairs, nu, ni)
    ctx["valid_data"] = InteractionData.build(valid_pairs, nu, ni)
    ctx["test_data"] = InteractionData.build(artifacts.test_pairs, nu, ni)


def init_model(args: TrainArgs, ctx: Dict[str, Any], trial=None) -> None:
    ctx["task"] = PMGTNCFTask(
        args,
        ctx["artifacts"],
        ctx["train_data"],
        ctx["valid_data"],
        ctx["test_data"],
        trial,
    )


def train(args: TrainArgs, ctx: Dict[str, Any], registry, run) -> Dict[str, float]:
    return engine.fit(
        ctx["task"],
        num_epochs=args.num_epochs,
        early=args.early,
        early_criterion=args.early_criterion,
        registry=registry,
        run=run,
        resume=args.run_id is not None,
        swa_start=args.extra.get("swa_start"),
        eval_interval=args.eval_interval,
        ckpt_interval=args.ckpt_interval,
        eval_init=bool(args.extra.get("eval_init", False)),
    )


def test(
    args: TrainArgs, ctx: Dict[str, Any], registry, run, is_hptuning: bool = False
) -> Dict[str, float]:
    task: PMGTNCFTask = ctx["task"]
    path = locate_eval_ckpt(registry, run, args.run_id)
    if path is not None:
        payload = restore_checkpoint(path)
        task.state = TrainState(
            jax.tree.map(jnp.asarray, payload["state"]["params"]),
            task.state.opt_state,
        )
    # During HPO, "test" metrics come from the validation split (the
    # reference's leakage guard, ncf/trainer.py:240-245).
    if is_hptuning:
        metrics = task.evaluate(task.state, "valid")
        return {k.replace("val/", "test/"): v for k, v in metrics.items()}
    return task.evaluate(task.state, "test")


def inference(args: TrainArgs, ctx: Dict[str, Any], registry, run):
    """Serving export: full-catalog top-K recommendations per user, items
    scored through the PMGT encoder tower over their cached contexts.
    Beyond the reference — PMGT_NCF is not even wired to a trainer there
    (no pmgt_ncf/trainer.py; train.py:306)."""
    task: PMGTNCFTask = ctx["task"]
    path = locate_eval_ckpt(registry, run, args.run_id)
    if path is not None:
        payload = restore_checkpoint(path)
        task.state = TrainState(
            jax.tree.map(jnp.asarray, payload["state"]["params"]),
            task.state.opt_state,
        )
    out = task.export_topk(
        task.state.params,
        k=int(args.extra.get("topk", TOPK)),
        # encoder forwards per (user, item): smaller serving tiles than
        # the embedding-dot models
        user_batch=int(args.extra.get("serve_user_batch", 64)),
        item_chunk=int(args.extra.get("serve_item_chunk", 1024)),
        exclude_train=not args.extra.get("include_seen_items", False),
        extras=(task.feat_tables, task._get_eval_ctx()),
    )
    if args.inference_result_path:
        np.savez(args.inference_result_path, **out)
        logger.info(
            "wrote top-%d recommendations for %d users to %s",
            out["item_ids"].shape[1],
            len(out["user_ids"]),
            args.inference_result_path,
        )
    return out
