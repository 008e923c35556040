"""DCN workload: CTR prediction with AUC, optionally seeded with PMGT item
embeddings (DCN-PMGT).

Behavioral reference: pmgt/dcn/trainer.py. Protocol quirks kept for metric
parity (SURVEY.md §6 hard parts): valid/test splits are evaluated
*pointwise* with negatives drawn once at dataset-build time by ``ng_sample``
(the reference constructs DCNDataset without is_training=False and calls
ng_sample on valid/test, dcn/trainer.py:60-78); AUC has a NaN→0 guard
(dcn/trainer.py:200-209).
"""
from __future__ import annotations

import logging
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.data.artifacts import load_artifacts, load_node_init_emb
from pmgt_tpu.data.interactions import (
    InteractionData,
    epoch_training_arrays,
    train_valid_split,
)
from pmgt_tpu.metrics.ranking import roc_auc, stable_sigmoid
from pmgt_tpu.models.dcn import DCN
from pmgt_tpu.models.ncf import inject_item_embeddings
from pmgt_tpu.core.mesh import gather_to_host, replicate_host
from pmgt_tpu.tasks.interaction_base import (
    InteractionTaskBase,
    TrainState,
    chunk_eval_inputs,
)
from pmgt_tpu.train import engine
from pmgt_tpu.train.checkpoints import restore_checkpoint
from pmgt_tpu.train.registry import locate_eval_ckpt

logger = logging.getLogger("pmgt_tpu")


class DCNTask(InteractionTaskBase):
    frozen_param = "item_embeddings"

    def __init__(
        self, args, artifacts, train_data, valid_data, test_data, trial=None
    ):
        super().__init__(args, train_data, valid_data, test_data, trial)
        self._artifacts = artifacts
        e = args.extra
        self.model = DCN(
            user_num=train_data.num_users,
            item_num=train_data.num_items,
            factor_num=e.get("factor_num", 32),
            deep_net_num_layers=e.get("deep_net_num_layers", 3),
            cross_net_num_layers=e.get("cross_net_num_layers", 3),
            emb_dropout=e.get("emb_dropout", 0.0),
            dropout=e.get("dropout", 0.0),
            use_layer_norm=e.get("use_layer_norm", False),
            layer_norm_eps=e.get("layer_norm_eps", 1e-12),
        )
        params = jax.jit(self.model.init)(
            {"params": jax.random.key(args.seed)},
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2,), jnp.int32),
        )["params"]
        params = dict(params)

        emb_path = e.get("item_init_emb_path")
        if emb_path:
            emb = load_node_init_emb(
                artifacts.item_classes,
                artifacts.node_classes,
                np.load(emb_path),
                normalize=e.get("normalize_item_init_emb", False),
                seed=args.seed,
            )
            params = inject_item_embeddings(params, emb, "item_embeddings")
            logger.info("injected PMGT item embeddings from %s", emb_path)

        self.finish_init(params)

        # Eval arrays are fixed at build time (reference dcn/trainer.py:76-78).
        ms = e.get("max_sample_items", 5)
        self._eval_arrays = {}
        for split, data in (("valid", valid_data), ("test", test_data)):
            key = jax.random.key(np.uint32(args.seed * 23 + (split == "test")))
            self._eval_arrays[split] = epoch_training_arrays(data, ms, key)
        self._eval_fn = jax.jit(self._eval_impl)
        self._eval_cache: Dict[str, Any] = {}

    def _eval_impl(self, params, users_c, items_c, labels_c, mask_c):
        """Whole-split evaluation as ONE program: ``lax.map`` over
        [C, chunk] point chunks (one device dispatch instead of ~950 at
        TG scale — each host dispatch pays a tunnel round trip). Returns
        per-point logits plus per-chunk masked-BCE sums/counts, the same
        mean-of-per-chunk-means the chunked host loop computed (padding
        rows carry mask 0 and only occur in the final chunk)."""

        def one(chunk):
            u, it, lb, m = chunk
            logits = self._score_impl(params, u, it)
            bce = (
                jnp.maximum(logits, 0)
                - logits * lb
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            return logits, (bce * m).sum(), m.sum()

        return jax.lax.map(one, (users_c, items_c, labels_c, mask_c))

    def evaluate(self, state, split: str = "valid") -> Dict[str, float]:
        params = state.params if isinstance(state, TrainState) else state
        split = "valid" if split == "valid" else "test"
        users, items, labels = self._eval_arrays[split]
        if split not in self._eval_cache:
            n, _, dev = chunk_eval_inputs(
                self.mesh,
                self.args.test_batch_size,
                (
                    users.astype(np.int32),
                    items.astype(np.int32),
                    labels.astype(np.float32),
                    np.ones(len(users), np.float32),
                ),
            )
            # Eval points are fixed at build time, so the device tensors
            # are reusable across every eval of the run.
            self._eval_cache[split] = (n, dev)
        n, dev = self._eval_cache[split]
        logits_c, loss_sums, mask_cnts = self._eval_fn(
            replicate_host(self.mesh, params), *dev
        )
        logits = gather_to_host(logits_c).reshape(-1)[:n]
        sums = gather_to_host(loss_sums)
        cnts = gather_to_host(mask_cnts)
        losses = (sums / np.maximum(cnts, 1))[cnts > 0]

        probs = stable_sigmoid(logits)
        probs[np.isnan(probs)] = 0  # reference NaN guard (dcn/trainer.py:201)
        auc = roc_auc(labels, probs)
        prefix = "val" if split == "valid" else "test"
        return {f"{prefix}/auc": float(auc), f"{prefix}/loss": float(np.mean(losses))}


# ----------------------------------------------------------------------
# 7-function workload contract
# ----------------------------------------------------------------------

def check_args(args: TrainArgs) -> None:
    if args.early_criterion not in ("loss", "auc"):
        raise ValueError(f"invalid early_criterion {args.early_criterion}")
    if args.model_name != "DCN":
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
    logger.info(
        "DCN data: %d train / %d valid / %d test pairs",
        len(train_pairs),
        len(valid_pairs),
        len(artifacts.test_pairs),
    )


def init_model(args: TrainArgs, ctx: Dict[str, Any], trial=None) -> None:
    ctx["task"] = DCNTask(
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
    task: DCNTask = ctx["task"]
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
    """Serving export: full-catalog top-K (user, item) CTR ranking from
    the best checkpoint, written as an npz of user_ids/item_ids/scores.
    Beyond the reference — its driver wires inference for PMGT only
    (train.py:322-324)."""
    task: DCNTask = ctx["task"]
    path = locate_eval_ckpt(registry, run, args.run_id)
    if path is not None:
        payload = restore_checkpoint(path)
        task.state = TrainState(
            jax.tree.map(jnp.asarray, payload["state"]["params"]),
            task.state.opt_state,
        )
    out = task.export_topk(
        task.state.params,
        k=int(args.extra.get("topk", 100)),
        exclude_train=not args.extra.get("include_seen_items", False),
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
