"""PMGT pretraining workload.

Behavioral reference: pmgt/pmgt/trainer.py + datasets.py + models.py.

TPU-native train step (everything under one jit):
    targets [B] --MCN sample--> target/pair/masked sequences
                --fused encoder pass--> GSR + NFR losses
                --grad + AdamW update (optional lax.scan microbatching)

The reference's DataLoader workers, per-sample encoder loop, and ragged
``num_pairs`` stitching all disappear: the host only supplies shuffled node
ids; the device does the rest.
"""
from __future__ import annotations

import logging
import os
from functools import partial
from typing import Any, Dict, Iterable, NamedTuple, Optional, Tuple

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
    pad_to_multiple,
    place_graph,
    put_along_data_axis,
    replicate_host,
    replicated,
)
from pmgt_tpu.core.quant import prepare_feat_tables
from pmgt_tpu.data.artifacts import DatasetArtifacts, load_artifacts
from pmgt_tpu.graph.container import NUM_SPECIAL_NODES, PaddedGraph
from pmgt_tpu.metrics.ranking import roc_auc, stable_sigmoid
from pmgt_tpu.models.pmgt import PMGTForPreTraining
from pmgt_tpu.sampling.pairs import (
    effective_refresh_chunk,
    make_pretrain_batch,
    make_pretrain_batch_cached,
    sample_all_contexts,
    sample_all_pairs,
)
# Safe (no cycle): interaction_base imports pmgt_task only lazily,
# inside its PMGT-injection helper.
from pmgt_tpu.tasks.interaction_base import chunk_eval_inputs
from pmgt_tpu.train import engine
from pmgt_tpu.train.checkpoints import restore_checkpoint
from pmgt_tpu.train.optim import make_optimizer
from pmgt_tpu.train.registry import RunRegistry, locate_eval_ckpt

logger = logging.getLogger("pmgt_tpu")


def _default_attention_impl() -> str:
    """Pallas kernels are the measured-faster path on TPU (+11% sustained
    training throughput); elsewhere they only run interpreted, so default
    to the XLA formulation."""
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def configure_prng(args: TrainArgs) -> None:
    """Select the PRNG implementation. ``rbg`` is hardware-accelerated on
    TPU and measures ~18% faster end-to-end than threefry for this
    dropout/sampling-heavy workload; distributions are identical, streams
    differ. Override with ``prng_impl: threefry2x32`` in args."""
    import jax

    impl = args.extra.get("prng_impl") or os.environ.get(
        "PMGT_TPU_PRNG", "rbg"
    )
    try:
        jax.config.update("jax_default_prng_impl", impl)
    except Exception:  # unknown impl name: keep the default
        logger.warning("unknown prng_impl %r; using JAX default", impl)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


class PMGTTask:
    """Engine Task for PMGT pretraining."""

    def __init__(
        self,
        args: TrainArgs,
        artifacts: DatasetArtifacts,
        train_nodes: np.ndarray,
        valid_nodes: np.ndarray,
        trial=None,
    ):
        configure_prng(args)
        self.args = args
        self.artifacts = artifacts
        self.train_nodes = np.asarray(train_nodes, np.int32)
        self.valid_nodes = np.asarray(valid_nodes, np.int32)
        self.trial = trial

        self.mesh = make_mesh(args.num_devices)
        n_dev = self.mesh.size
        if args.train_batch_size % (n_dev * args.accumulation_step):
            raise ValueError(
                f"train_batch_size {args.train_batch_size} must be divisible "
                f"by num_devices*accumulation ({n_dev}*{args.accumulation_step})"
            )

        feat_dims = tuple(int(e.shape[-1]) for e in artifacts.feat_init_embs)
        self.config = PMGTConfig(
            hidden_size=args.extra.get("hidden_size", 128),
            feat_hidden_sizes=feat_dims,
            intermediate_size=args.extra.get("intermediate_size", 128),
            num_hidden_layers=args.extra.get("num_hidden_layers", 5),
            num_attention_heads=args.extra.get("num_attention_heads", 1),
            beta=args.extra.get("beta", 0.5),
            position_embedding_type=args.extra.get(
                "position_embedding_type", "absolute"
            ),
            attention_impl=args.extra.get("attention_impl") or _default_attention_impl(),
            dtype="bfloat16" if args.mp_enabled else "float32",
            gradient_checkpointing=args.extra.get("gradient_checkpointing", False),
            fusion_strategy=resolve_fusion_strategy(
                args.extra.get("fusion_strategy"), artifacts.num_nodes
            ),
        )
        self.sampling = SamplingConfig(
            max_ctx_neigh=args.extra.get("max_ctx_neigh", 5),
            hop_sampling_sizes=tuple(
                args.extra.get("hop_sampling_sizes", (16, 8, 4))
            ),
            max_total_samples=args.extra.get("max_total_samples", 10),
            min_neg_samples=args.extra.get("min_neg_samples", 5),
            # The true row count, captured BEFORE device placement:
            # --shard-graph-tables pads the placed tables' node axis to a
            # device multiple (core/mesh.place_graph).
            num_total=artifacts.graph.num_total,
        )
        self.model = PMGTForPreTraining(
            config=self.config,
            node_size=artifacts.num_nodes,
            random_node_ratio=args.extra.get("random_node_ratio", 0.02),
            mask_node_ratio=args.extra.get("mask_node_ratio", 0.16),
        )

        # Device placement: frozen feature tables + graph. runtime_view
        # drops the build-only arrays (nbr_logits / alias_prob /
        # alias_idx) before they cost per-device HBM. --shard-graph-tables
        # row-shards the per-node draw/neighbor tables over the mesh —
        # beyond ~2M nodes they are the dominant unsharded tenant
        # (core/mesh.place_graph).
        self.graph = place_graph(
            self.mesh,
            artifacts.graph.runtime_view(),
            shard=bool(args.extra.get("shard_graph_tables")),
        )
        # Frozen feature tables: replicated fp32 by default; three HBM
        # levers for production node counts, composable and all leaving
        # the jitted step untouched (XLA inserts gather collectives /
        # convert ops as needed):
        #   --shard-feat-tables   row-shards the node axis over the mesh
        #   --feat-tables-dtype bfloat16   halves storage and the
        #     per-step full-table projection read (the tables are frozen
        #     inputs; losses still reduce in fp32)
        #   --feat-tables-dtype int8   symmetric per-row quantization
        #     (core/quant.py): halves storage AND the gather_rows raw-row
        #     traffic again vs bf16, at a bounded max|row|/254 per-element
        #     feature error
        # Under the bf16 compute policy the step casts the tables to bf16
        # anyway, so bf16 *storage* is numerically identical (measured:
        # bit-same loss) and just halves HBM + the projection read —
        # default to it when mp is on.
        default_dtype = "bfloat16" if args.mp_enabled else "float32"
        table_dtype = str(
            args.extra.get("feat_tables_dtype") or default_dtype
        )
        self.feat_tables = prepare_feat_tables(
            artifacts.feat_init_embs,
            table_dtype,
            self.mesh,
            shard=bool(args.extra.get("shard_feat_tables")),
        )

        # Parameters + optimizer.
        init_rngs = {
            "params": jax.random.key(args.seed),
            "dropout": jax.random.key(args.seed + 1),
            "corruption": jax.random.key(args.seed + 2),
        }
        # Shape-only dummy batch: parameter shapes don't depend on data.
        s = self.sampling.seq_len
        p = self.sampling.max_total_samples
        from pmgt_tpu.sampling.pairs import PretrainBatch

        dummy_batch = PretrainBatch(
            target_ids=jnp.zeros((2, s), jnp.int32),
            target_mask=jnp.ones((2, s), jnp.float32),
            pair_ids=jnp.zeros((2, p, s), jnp.int32),
            pair_mask=jnp.ones((2, p, s), jnp.float32),
            labels=jnp.zeros((2, p), jnp.float32),
            pair_valid=jnp.ones((2, p), jnp.float32),
        )
        variables = jax.jit(
            partial(self.model.init, deterministic=False)
        )(init_rngs, self.feat_tables, dummy_batch)
        params = replicate_host(self.mesh, variables["params"])

        steps_per_epoch = max(
            len(self.train_nodes) // args.train_batch_size, 1
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
        )
        self.state = TrainState(
            params, replicate_host(self.mesh, self.tx.init(params))
        )

        self._batch_sharding = batch_sharding(self.mesh)
        # Per-epoch context cache (see sample_all_contexts). Default on:
        # same marginal context distribution, ~11x less sampling work.
        self.use_ctx_cache = bool(args.extra.get("ctx_cache", True))
        self._ctx_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        self._ctx_cache_tag: Optional[Tuple] = None
        # Non-train phases (valid/test/inference) cache separately so a
        # train-epoch retag never evicts them and — crucially — their
        # draws are schedule-independent (see _get_ctx).
        self._phase_ctx_cache: Dict[Tuple, Tuple] = {}
        n_total = self.sampling.num_total  # true rows (placed may be padded)
        # Graph arrays are jit ARGUMENTS, not captured constants: TPU
        # dynamic gather only hits its fast path on unmodified program
        # parameters (captured operands measured ~1000x slower).
        self._all_nodes = replicate_host(
            self.mesh, np.arange(n_total, dtype=np.int32)
        )
        # Key derivation happens INSIDE each jit (from a seed scalar):
        # eager key/split programs before the dispatch would serialize
        # the epoch pipeline through the tunnel. The in-program
        # derivation reproduces the previous split(key(seed)) stream
        # bit-for-bit.
        def _ctx_key(seed):
            return jax.random.split(jax.random.key(seed))[0]

        def _pairs_key(seed):
            return jax.random.split(jax.random.key(seed))[1]

        # Refresh chunk: the full 65,536 unless the persistent tenants
        # (tables + graph + per-epoch caches) squeeze the chunked
        # refresh's hop-gather transient out of HBM — chunk latency
        # dominates, so only shrink under real memory pressure (see
        # effective_refresh_chunk). Per-device bytes so sharded tables
        # count at their sharded footprint.
        hbm = int(os.environ.get("PMGT_TPU_HBM_BYTES", 16 << 30))
        headroom = 3 << 30  # step activations, optimizer state, slack
        persistent = sum(
            l.addressable_shards[0].data.nbytes
            for l in jax.tree.leaves((self.feat_tables, self.graph))
        )
        s_len = self.sampling.seq_len
        p_len = self.sampling.max_total_samples
        # Resident ctx+pair caches, worst case: the engine's lag-1
        # speculation keeps epoch k's cache alive (held by the dispatched
        # program) while epoch k+1's is drawn (2), grouped-epoch programs
        # hold eval_interval distinct caches at once, and the fixed eval
        # draw (_phase_ctx_cache) persists for the whole run (+1).
        n_caches = max(2, int(getattr(args, "eval_interval", 1) or 1)) + 1
        persistent += n_caches * n_total * (8 * s_len + 12 * p_len)
        self._refresh_chunk = effective_refresh_chunk(
            self.graph, self.sampling,
            max(hbm - headroom - persistent, 0),
        )
        self._sample_all_fn = jax.jit(
            lambda graph, nodes, seed: sample_all_contexts(
                graph, _ctx_key(seed), self.sampling, n_total,
                all_nodes=nodes, chunk=self._refresh_chunk,
            )
        )
        self._sample_pairs_train_fn = jax.jit(
            lambda graph, seed: sample_all_pairs(
                graph, _pairs_key(seed), self.sampling, n_total, is_training=True
            )
        )
        self._sample_pairs_eval_fn = jax.jit(
            lambda graph, seed: sample_all_pairs(
                graph, _pairs_key(seed), self.sampling, n_total, is_training=False
            )
        )
        self._train_step_fn = jax.jit(
            partial(self._train_step_impl, accum=args.accumulation_step),
            donate_argnums=(0,),
        )
        # Whole-epoch runner: lax.scan over steps → ONE host dispatch per
        # epoch. Keeps the device saturated when host→device dispatch
        # latency is high (device-side step time measured 10.7 ms vs ~23 ms
        # per step with per-step dispatch through a remote tunnel).
        self.use_scan_epoch = bool(args.extra.get("scan_epoch", True))
        # NB: the epoch runner does NOT donate its input state — the
        # engine's pipelined scan mode keeps the pre-epoch state alive
        # (eval, checkpointing, and the speculative next-epoch dispatch
        # all read it after this dispatch). One extra copy of
        # params+opt_state per epoch is noise next to the epoch itself.
        self._train_epoch_fn = jax.jit(
            partial(self._epoch_impl, accum=args.accumulation_step)
        )
        # Multi-epoch runner (engine --eval-interval k): k epochs in ONE
        # dispatch. The epochs are UNROLLED in Python (k is small and
        # static), NOT lax.scan-ed over stacked ctx tables: scanning would
        # slice the stacked tables per epoch, and context gathers from
        # anything but an unmodified jit parameter were measured 2.1x
        # slower (they leave the TPU dynamic-gather fast path — see the
        # refresh note in train_epoch). Retraces per distinct k (two
        # compiles when num_epochs % k != 0).
        self._train_epochs_fn = jax.jit(
            partial(self._multi_epoch_impl, accum=args.accumulation_step)
        )
        self._eval_step_fn = jax.jit(self._eval_step_impl)
        self._encode_fn = jax.jit(self._encode_impl)
        self._eval_all_fn = jax.jit(self._eval_all_impl)
        self._encode_all_fn = jax.jit(self._encode_all_impl)
        self._eval_input_cache: Dict[str, Any] = {}
        self._epoch_rng = np.random.default_rng(args.seed)
        self._step_count = 0

    # ------------------------------------------------------------------
    # jitted step implementations
    # ------------------------------------------------------------------
    def _build_batch(self, graph, targets, key, ctx, is_training):
        """ctx = (ctx_ids, ctx_mask, pair_cache) per-epoch cache tables,
        or None for fresh per-occurrence sampling (exact reference
        semantics)."""
        if ctx is None:
            return make_pretrain_batch(
                graph, targets, key, self.sampling, is_training
            )
        return make_pretrain_batch_cached(
            graph,
            ctx[0],
            ctx[1],
            targets,
            key,
            self.sampling,
            is_training,
            pair_cache=ctx[2],
        )

    def _loss_fn(self, params, graph, feat_tables, targets, key, ctx):
        k_sample, k_drop, k_corr = jax.random.split(key, 3)
        batch = self._build_batch(graph, targets, k_sample, ctx, True)
        out = self.model.apply(
            {"params": params},
            feat_tables,
            batch,
            deterministic=False,
            rngs={"dropout": k_drop, "corruption": k_corr},
        )
        return out.loss, out

    def _train_step_impl(self, state: TrainState, graph, feat_tables,
                         targets, key, ctx, accum: int):
        """graph/feat_tables enter as jit PARAMETERS, never via closure:
        closure-captured arrays are embedded in the lowered module as
        literal constants, which scales the compile payload with the
        graph (HTTP 413 through the compile tunnel at 100k nodes) and
        would defeat their sharding annotations."""
        if accum == 1:
            (loss, out), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
                state.params, graph, feat_tables, targets, key, ctx
            )
            metrics = {
                "loss": loss,
                "gsr": out.gsr_loss,
                "nfr": out.nfr_loss,
            }
        else:
            micro = targets.reshape(accum, -1)
            keys = jax.random.split(key, accum)

            def body(carry, xs):
                t, k = xs
                (loss, out), grads = jax.value_and_grad(
                    self._loss_fn, has_aux=True
                )(state.params, graph, feat_tables, t, k, ctx)
                acc_g, acc_l, acc_gsr, acc_nfr = carry
                return (
                    jax.tree.map(jnp.add, acc_g, grads),
                    acc_l + loss,
                    acc_gsr + out.gsr_loss,
                    acc_nfr + out.nfr_loss,
                ), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss, gsr, nfr), _ = jax.lax.scan(
                body, (zeros, 0.0, 0.0, 0.0), (micro, keys)
            )
            inv = 1.0 / accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            metrics = {"loss": loss * inv, "gsr": gsr * inv, "nfr": nfr * inv}

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), metrics

    def _epoch_impl(self, state, graph, feat_tables, targets_all, seed,
                    ctx, accum: int):
        """lax.scan over an epoch's steps: targets_all [S, B]; the
        per-step keys derive from the ``seed`` scalar IN-program — eager
        key/split ops outside jit are each their own tunneled program
        dispatch and serialize the epoch pipeline (CLAUDE.md)."""
        keys = jax.random.split(jax.random.key(seed), targets_all.shape[0])

        def body(st, xs):
            t, k = xs
            st, metrics = self._train_step_impl(
                st, graph, feat_tables, t, k, ctx, accum
            )
            return st, metrics["loss"]

        state, losses = jax.lax.scan(body, state, (targets_all, keys))
        return state, losses

    def _multi_epoch_impl(self, state, graph, feat_tables, targets_tuple,
                          seeds_tuple, ctx_tuple, accum: int):
        """k epochs unrolled inside one program; each epoch's ctx tables
        are separate unmodified jit parameters (see _train_epochs_fn)."""
        losses_all = []
        for targets_all, seed, ctx in zip(targets_tuple, seeds_tuple,
                                          ctx_tuple):
            state, losses = self._epoch_impl(
                state, graph, feat_tables, targets_all, seed, ctx, accum
            )
            losses_all.append(losses)
        return state, jnp.stack(losses_all)

    def _epoch_schedule(self, epoch: int) -> np.ndarray:
        """The epoch's shuffled target ids — the ONE derivation of the
        per-epoch data order, shared by the scan path (_epoch_inputs)
        and the batch iterator (train_batches) so the documented
        scan-vs-batch same-data property cannot drift."""
        ids = self.train_nodes.copy()
        rng = np.random.default_rng(self.args.seed * 100_003 + epoch)
        rng.shuffle(ids)
        return ids

    def _epoch_inputs(self, epoch: int):
        """Shuffled target schedule [S, B] + the epoch's scan seed.
        Advances the per-step key counter; shared by train_epoch and
        train_epochs so grouped and sequential runs consume identical
        PRNG streams."""
        bs = self.args.train_batch_size
        ids = self._epoch_schedule(epoch)
        n_full = len(ids) // bs
        if n_full == 0:
            return None, None
        targets_all = put_along_data_axis(
            self.mesh, ids[: n_full * bs].reshape(n_full, bs), axis=1
        )
        seed = np.uint32(self.args.seed * 7_919 + self._step_count + 1)
        self._step_count += n_full
        return targets_all, seed

    def train_epoch(self, state, epoch: int):
        """Engine fast path: run one full epoch in a single dispatch.
        Returns (state, per-step losses as a device array)."""
        targets_all, seed = self._epoch_inputs(epoch)
        if targets_all is None:
            return state, np.zeros((0,), np.float32)
        # NOTE: the cache refresh stays a SEPARATE dispatch on purpose.
        # Folding it into the epoch jit was measured 2.1x slower per step
        # (13.5 -> 28.9 ms): ctx tables produced inside the program are no
        # longer unmodified jit parameters, so every step's context gather
        # leaves the TPU dynamic-gather fast path. Both dispatches are
        # async — the host never blocks between them — so the separate
        # refresh costs dispatch time only.
        ctx = self._get_ctx(("train", epoch)) if self.use_ctx_cache else None
        state, losses = self._train_epoch_fn(
            state, self.graph, self.feat_tables, targets_all, seed, ctx
        )
        return state, losses

    def train_epochs(self, state, start_epoch: int, k: int):
        """Engine --eval-interval fast path: k consecutive epochs in ONE
        dispatch (refreshes stay separate per-epoch dispatches, all
        async). Returns (state, losses [k, steps_per_epoch]). Consumes
        exactly the PRNG/shuffle/ctx streams of k sequential train_epoch
        calls, so grouped training is bit-compatible with sequential
        (tests assert identical losses and params).

        Rationale: through a high-latency dispatch tunnel the device
        idles one dispatch+fetch round trip per fetched program even
        under lag-1 speculation (execution is demand-driven); grouping
        k epochs amortizes that round trip k-fold."""
        tgts, seeds, ctxs = [], [], []
        for e in range(start_epoch, start_epoch + k):
            targets_all, seed = self._epoch_inputs(e)
            if targets_all is None:
                return state, np.zeros((k, 0), np.float32)
            tgts.append(targets_all)
            seeds.append(seed)
            ctxs.append(
                self._get_ctx(("train", e)) if self.use_ctx_cache else None
            )
        state, losses = self._train_epochs_fn(
            state, self.graph, self.feat_tables,
            tuple(tgts), tuple(seeds), tuple(ctxs),
        )
        return state, losses

    def _eval_step_impl(self, params, graph, feat_tables, targets,
                        sample_valid, key, ctx):
        batch = self._build_batch(graph, targets, key, ctx, False)
        out = self.model.apply(
            {"params": params},
            feat_tables,
            batch,
            deterministic=True,
            compute_nfr=False,
        )
        pair_valid = batch.pair_valid * sample_valid[:, None]
        return out.logits, batch.labels, pair_valid

    def _eval_all_impl(self, params, graph, feat_tables, targets_c, sv_c,
                       seed, ctx):
        """Whole-split evaluation as ONE program: ``lax.map`` over
        [C, chunk] node chunks (one device dispatch instead of one per
        chunk — each host dispatch pays a tunnel round trip). Per-chunk
        keys derive in-program from the seed scalar."""

        def one(args_):
            idx, targets, sv = args_
            key = jax.random.fold_in(jax.random.key(seed), idx)
            return self._eval_step_impl(
                params, graph, feat_tables, targets, sv, key, ctx
            )

        idxs = jnp.arange(targets_c.shape[0], dtype=jnp.uint32)
        return jax.lax.map(one, (idxs, targets_c, sv_c))

    def _encode_all_impl(self, params, graph, feat_tables, targets_c,
                         seed, ctx):
        """Whole-catalog CLS export as ONE program (inference mode):
        ``lax.map`` over [C, chunk] node chunks — 195 per-chunk
        dispatches at the 100k-node scale collapse to one."""

        def one(args_):
            idx, targets = args_
            key = jax.random.fold_in(jax.random.key(seed), idx)
            return self._encode_impl(
                params, graph, feat_tables, targets, key, ctx
            )

        idxs = jnp.arange(targets_c.shape[0], dtype=jnp.uint32)
        return jax.lax.map(one, (idxs, targets_c))

    def _encode_impl(self, params, graph, feat_tables, targets, key, ctx):
        """CLS embeddings for a batch of nodes (inference export)."""
        from pmgt_tpu.sampling.mcn import sample_context

        if ctx is None:
            node_ids, mask = sample_context(
                graph, targets, key, self.sampling
            )
        else:
            node_ids, mask = ctx[0][targets], ctx[1][targets]
        hidden = self.model.apply(
            {"params": params},
            feat_tables,
            node_ids,
            mask,
            deterministic=True,
            method=PMGTForPreTraining.encode,
        )
        return hidden[:, 0]

    def _phase_seed(self, tag) -> np.uint32:
        """Deterministic per-phase cache seed: Python's str hash is
        PYTHONHASHSEED-randomized, so hash(tag) would make eval
        negatives/contexts — and therefore val metrics and best-ckpt
        selection — irreproducible across processes."""
        phase_id = {"train": 1, "valid": 2, "test": 3, "inference": 4}[tag[0]]
        step = int(tag[1]) if len(tag) > 1 else 0
        return np.uint32(self.args.seed * 104_729 + phase_id * 2_000_003 + step)

    def _draw_ctx(self, tag):
        seed = self._phase_seed(tag)
        ctx_ids, ctx_mask = self._sample_all_fn(
            self.graph, self._all_nodes, seed
        )
        if tag[0] == "train":
            pairs = self._sample_pairs_train_fn(self.graph, seed)
        elif tag[0] in ("valid", "test"):
            pairs = self._sample_pairs_eval_fn(self.graph, seed)
        else:  # inference never consumes pairs
            pairs = None
        return (ctx_ids, ctx_mask, pairs)

    def _get_ctx(self, tag):
        """Per-phase cache (contexts + pairs); None when caching is
        disabled. Tags: ("train", epoch) — one fresh draw per epoch in a
        single evicting slot — and ("valid",)/("test",)/("inference",):
        one FIXED draw per split per run, cached separately so train
        retags never evict it. The fixed eval draw makes val metrics a
        pure function of the params: keying eval on the training
        schedule would read whatever epoch the engine last STARTED (its
        pipelined scan mode dispatches epoch k+1 before evaluating
        epoch k), making best-checkpoint selection depend on
        speculation/preemption timing (same hazard pmgt_ncf_task's
        _get_eval_ctx documents)."""
        if not self.use_ctx_cache:
            return None
        if tag[0] != "train":
            if tag not in self._phase_ctx_cache:
                self._phase_ctx_cache[tag] = self._draw_ctx(tag)
            return self._phase_ctx_cache[tag]
        if self._ctx_cache_tag != tag:
            self._ctx_cache = self._draw_ctx(tag)
            self._ctx_cache_tag = tag
        return self._ctx_cache

    # ------------------------------------------------------------------
    # engine Task protocol
    # ------------------------------------------------------------------
    def on_epoch_start(self, epoch: int) -> None:
        # Refresh the per-epoch context cache (one fresh context per node
        # per epoch — the reference's target-context refresh rate).
        self._get_ctx(("train", epoch))

    def on_resume(self, global_step: int, start_epoch: int) -> None:
        # Continue the per-step PRNG key stream where the interrupted run
        # left off instead of replaying its early keys.
        self._step_count = int(global_step)

    def train_batches(self, epoch: int) -> Iterable[Tuple[jnp.ndarray, jax.Array]]:
        bs = self.args.train_batch_size
        ids = self._epoch_schedule(epoch)
        n_full = len(ids) // bs
        for i in range(n_full):
            chunk = ids[i * bs : (i + 1) * bs]
            targets = put_along_data_axis(self.mesh, chunk)
            self._step_count += 1
            key = jax.random.key(
                np.uint32(self.args.seed * 7_919 + self._step_count)
            )
            yield targets, key

    def train_step(self, state, batch):
        targets, key = batch
        ctx = None
        if self.use_ctx_cache:
            if self._ctx_cache is None:
                self._get_ctx(("train", 0))
            ctx = self._ctx_cache
        return self._train_step_fn(
            state, self.graph, self.feat_tables, targets, key, ctx
        )

    def evaluate(self, state, split: str = "valid") -> Dict[str, float]:
        params = state.params if isinstance(state, TrainState) else state
        ctx = self._get_ctx((split,))
        if "eval" not in self._eval_input_cache:
            # One fixed [C, chunk] chunking of the (constant) eval node
            # set, device-cached for the run; the whole split is then
            # scored by a single lax.map dispatch per eval. Padding node
            # ids hit the NUM_SPECIAL_NODES sentinel row and are masked
            # by the zero-padded sample-valid array.
            nodes = np.asarray(self.valid_nodes, np.int32)
            _, _, (targets_c, sv_c) = chunk_eval_inputs(
                self.mesh,
                self.args.test_batch_size,
                (nodes, np.ones(len(nodes), np.float32)),
                pad_values=(NUM_SPECIAL_NODES, 0),
            )
            self._eval_input_cache["eval"] = (targets_c, sv_c)
        targets_c, sv_c = self._eval_input_cache["eval"]
        logits, labels, pair_valid = self._eval_all_fn(
            params,
            self.graph,
            self.feat_tables,
            targets_c,
            sv_c,
            np.uint32(self.args.seed * 31),
            ctx,
        )
        logits = gather_to_host(logits).ravel()
        labels = gather_to_host(labels).ravel()
        valid = gather_to_host(pair_valid).ravel() > 0
        logits, labels = logits[valid], labels[valid]

        probs = stable_sigmoid(logits)
        auc = roc_auc(labels, probs)
        losses = np.maximum(logits, 0) - logits * labels + np.log1p(
            np.exp(-np.abs(logits))
        )
        prefix = "val" if split == "valid" else "test"
        return {f"{prefix}/auc": float(auc), f"{prefix}/loss": float(losses.mean())}

    def should_prune(self, value: float, epoch: int) -> bool:
        if self.trial is None:
            return False
        self.trial.report(value, epoch)
        return bool(self.trial.should_prune())

    # ------------------------------------------------------------------
    def export_embeddings(self, params, batch_size: Optional[int] = None) -> np.ndarray:
        """Per-node CLS embedding matrix over all real nodes in id order —
        the reference's inference mode artifact
        (pmgt/pmgt/trainer.py:259-275)."""
        bs = batch_size or self.args.test_batch_size
        n = self.artifacts.num_nodes
        ctx = self._get_ctx(("inference",))
        node_ids = np.arange(
            NUM_SPECIAL_NODES, n + NUM_SPECIAL_NODES, dtype=np.int32
        )
        _, chunk, (targets_c,) = chunk_eval_inputs(
            self.mesh, bs, (node_ids,), pad_values=(NUM_SPECIAL_NODES,)
        )
        c = targets_c.shape[0]
        cls = gather_to_host(
            self._encode_all_fn(
                params,
                self.graph,
                self.feat_tables,
                targets_c,
                np.uint32(self.args.seed * 13 + 7),
                ctx,
            )
        )
        return cls.reshape(c * chunk, -1)[:n].astype(np.float32)


# ----------------------------------------------------------------------
# 7-function workload contract (reference train.py:317-339)
# ----------------------------------------------------------------------

def check_args(args: TrainArgs) -> None:
    if args.early_criterion not in ("loss", "auc"):
        raise ValueError(f"invalid early_criterion {args.early_criterion}")
    if args.mode in ("eval", "inference") and args.run_id is None:
        raise ValueError(f"mode {args.mode} requires --run-id")


def init_run(args: TrainArgs) -> None:
    np.random.seed(args.seed)


def init_dataloader(args: TrainArgs, ctx: Dict[str, Any]) -> None:
    if args.run_id is not None:
        _restore_params_from_run(args)
    artifacts = ctx.get("artifacts") or load_artifacts(
        args.data_dir, args.dataset_name
    )
    ctx["artifacts"] = artifacts
    from sklearn.model_selection import train_test_split

    all_nodes = np.arange(
        NUM_SPECIAL_NODES,
        artifacts.num_nodes + NUM_SPECIAL_NODES,
        dtype=np.int32,
    )
    train_nodes, valid_nodes = train_test_split(
        all_nodes, test_size=args.valid_size, random_state=args.seed
    )
    ctx["train_nodes"] = train_nodes
    ctx["valid_nodes"] = valid_nodes
    logger.info(
        "PMGT data: %d nodes (%d train / %d valid), graph max_deg %d",
        artifacts.num_nodes,
        len(train_nodes),
        len(valid_nodes),
        artifacts.graph.max_degree,
    )


def _restore_params_from_run(args: TrainArgs) -> None:
    """Reload model/sampling hyperparameters from a previous run
    (reference pmgt/pmgt/trainer.py:74-81,138-147)."""
    registry = RunRegistry(args.log_dir)
    params = registry.get_run(args.run_id).params
    for name in (
        "hidden_size",
        "intermediate_size",
        "num_hidden_layers",
        "num_attention_heads",
        "beta",
        # Structural: relative-position runs add a distance_embedding
        # param and change the attention math — omitting this silently
        # rebuilt an absolute-attention model at eval/inference (the
        # template-free params restore ignores unexpected extra leaves).
        "position_embedding_type",
        "random_node_ratio",
        "mask_node_ratio",
        "max_ctx_neigh",
        "max_total_samples",
        "min_neg_samples",
        "hop_sampling_sizes",
    ):
        if name in params:
            args.extra[name] = params[name]


def init_model(args: TrainArgs, ctx: Dict[str, Any], trial=None) -> None:
    ctx["task"] = PMGTTask(
        args, ctx["artifacts"], ctx["train_nodes"], ctx["valid_nodes"], trial
    )


def _restore_params_only(path: str, task: PMGTTask) -> None:
    """Load just the model params from a checkpoint (raw restore, like
    ncf_task/dcn_task.test). Eval/inference never touch the optimizer
    state, and rebuilding it as a restore template would force the
    invocation to repeat every opt-state-shaping training flag
    (gradient_max_norm adds a clip link to the optax chain; a mismatch
    is an opaque orbax tree error)."""
    payload = restore_checkpoint(path)
    task.state = TrainState(
        jax.tree.map(jnp.asarray, payload["state"]["params"]),
        task.state.opt_state,
    )


def _maybe_restore(args: TrainArgs, task: PMGTTask, load_best: bool) -> None:
    if args.run_id is None:
        return
    registry = RunRegistry(args.log_dir)
    path = locate_eval_ckpt(registry, None, args.run_id, load_best=load_best)
    if path is None:
        return
    _restore_params_only(path, task)
    logger.info("restored checkpoint from %s", path)


def train(args: TrainArgs, ctx: Dict[str, Any], registry, run) -> Dict[str, float]:
    task: PMGTTask = ctx["task"]
    results = engine.fit(
        task,
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
    return results


def test(
    args: TrainArgs, ctx: Dict[str, Any], registry, run, is_hptuning: bool = False
) -> Dict[str, float]:
    """Evaluate the best checkpoint on the validation nodes (the reference
    reuses valid as test for PMGT, pmgt/pmgt/trainer.py:71)."""
    task: PMGTTask = ctx["task"]
    path = locate_eval_ckpt(registry, run, args.run_id)
    if path is not None:
        _restore_params_only(path, task)
    if is_hptuning:
        metrics = task.evaluate(task.state, "valid")
        return {k.replace("val/", "test/"): v for k, v in metrics.items()}
    return task.evaluate(task.state, "test")


def inference(args: TrainArgs, ctx: Dict[str, Any], registry, run) -> np.ndarray:
    task: PMGTTask = ctx["task"]
    _maybe_restore(args, task, load_best=True)
    emb = task.export_embeddings(task.state.params)
    if args.inference_result_path:
        os.makedirs(
            os.path.dirname(os.path.abspath(args.inference_result_path)),
            exist_ok=True,
        )
        np.save(args.inference_result_path, emb)
        logger.info("saved node embeddings to %s", args.inference_result_path)
    return emb
