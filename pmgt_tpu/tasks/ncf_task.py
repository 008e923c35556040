"""NCF workload: GMF / MLP / NeuMF-end / NeuMF-pre, with optional
PMGT-pretrained item embeddings (the paper's NeuMF-PMGT configuration).

Behavioral reference: pmgt/ncf/trainer.py. The per-user Python scoring loop
(ncf/trainer.py:202-219) becomes one batched forward over [B, L] candidate
grids followed by an on-device top-k.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.data.artifacts import (
    DatasetArtifacts,
    load_artifacts,
    load_node_init_emb,
)
from pmgt_tpu.data.interactions import (
    InteractionData,
    build_eval_candidates,
    train_valid_split,
)
from pmgt_tpu.metrics.ranking import get_ndcg, get_recall
from pmgt_tpu.models.ncf import NCF, fuse_neumf_params, inject_item_embeddings
from pmgt_tpu.core.mesh import gather_to_host, replicate_host
from pmgt_tpu.tasks.interaction_base import (
    InteractionTaskBase,
    TrainState,
    chunk_eval_inputs,
)
from pmgt_tpu.train import engine
from pmgt_tpu.train.checkpoints import restore_checkpoint
from pmgt_tpu.train.registry import RunRegistry, locate_eval_ckpt

logger = logging.getLogger("pmgt_tpu")

TOPK = 100  # reference scores each user's candidates and keeps top-100
# (ncf/trainer.py:213-214)


class NCFTask(InteractionTaskBase):
    frozen_param = "embed_item_MLP"

    def __init__(
        self, args, artifacts, train_data, valid_data, test_data, trial=None
    ):
        super().__init__(args, train_data, valid_data, test_data, trial)
        self._artifacts = artifacts
        e = args.extra
        self.model = NCF(
            user_num=train_data.num_users,
            item_num=train_data.num_items,
            factor_num=e.get("factor_num", 32),
            num_layers=e.get("num_layers", 3),
            emb_dropout=e.get("emb_dropout", 0.0),
            dropout=e.get("dropout", 0.0),
            use_layer_norm=e.get("use_layer_norm", False),
            layer_norm_eps=e.get("layer_norm_eps", 1e-12),
            model=args.model_name,
        )
        params = jax.jit(self.model.init)(
            {"params": jax.random.key(args.seed)},
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2,), jnp.int32),
        )["params"]
        params = self._apply_pretrained(dict(params))
        self.finish_init(params)
        self._rank_fn = jax.jit(self._rank_impl)
        self._eval_fn = jax.jit(self._eval_impl)
        self._eval_cache: Dict[str, Any] = {}

    def _apply_pretrained(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """NeuMF-pre fusion from GMF/MLP runs + optional PMGT item-embedding
        injection (reference ncf/trainer.py:107-180)."""
        args = self.args
        registry = RunRegistry(args.log_dir)

        def load_run_params(run_id):
            path = registry.get_ckpt_path(run_id, load_best=True)
            payload = restore_checkpoint(path)
            return payload["state"]["params"]

        gmf_run = args.extra.get("gmf_run_id")
        mlp_run = args.extra.get("mlp_run_id")
        if args.model_name == "NeuMF-pre":
            if not (gmf_run and mlp_run):
                raise ValueError("NeuMF-pre requires gmf_run_id and mlp_run_id")
            params = fuse_neumf_params(
                params,
                load_run_params(gmf_run),
                load_run_params(mlp_run),
                alpha=args.extra.get("alpha", 0.5),
            )

        emb_path = args.extra.get("item_init_emb_path")
        if emb_path:
            art = self._artifacts
            emb = load_node_init_emb(
                art.item_classes,
                art.node_classes,
                np.load(emb_path),
                normalize=args.extra.get("normalize_item_init_emb", False),
                seed=args.seed,
            )
            # Project/check against factor_num * 2^(num_layers-1).
            params = inject_item_embeddings(params, emb, "embed_item_MLP")
            logger.info("injected PMGT item embeddings from %s", emb_path)
        return params

    # ------------------------------------------------------------------
    def _rank_impl(self, params, users, candidates, cand_mask):
        """[B] users × [B, L] candidates → top-100 candidate item ids."""
        u = jnp.broadcast_to(users[:, None], candidates.shape)
        logits = self.model.apply(
            {"params": params}, u, candidates, deterministic=True
        )
        neg_inf = jnp.finfo(logits.dtype).min
        masked = jnp.where(cand_mask > 0, logits, neg_inf)
        _, top_idx = jax.lax.top_k(masked, min(TOPK, masked.shape[1]))
        top_items = jnp.take_along_axis(candidates, top_idx, axis=1)
        return top_items, logits

    def _eval_impl(self, params, users_c, cand_c, mask_c, labels_c):
        """Whole-split evaluation as ONE program: ``lax.map`` over
        [C, chunk] user chunks (one device dispatch instead of one per
        chunk — each host dispatch pays a tunnel round trip). Returns
        per-user top-k items plus per-chunk masked-BCE sums/counts, the
        same mean-of-per-chunk-means the chunked host loop computed
        (padding rows carry mask 0, so they contribute nothing)."""

        def one(chunk):
            u, c, m, lb = chunk
            top_items, logits = self._rank_impl(params, u, c, m)
            bce = (
                jnp.maximum(logits, 0)
                - logits * lb
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            return top_items, (bce * m).sum(), m.sum()

        return jax.lax.map(one, (users_c, cand_c, mask_c, labels_c))

    def evaluate(self, state, split: str = "valid") -> Dict[str, float]:
        params = state.params if isinstance(state, TrainState) else state
        data = self.valid_data if split == "valid" else self.test_data
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
                max(self.args.test_batch_size // 8, self.mesh.size),
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
            replicate_host(self.mesh, params), *dev
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
        if split == "valid":
            results[f"{prefix}/n20"] = get_ndcg(prediction, gt_sets, top=20)
            results[f"{prefix}/r20"] = get_recall(prediction, gt_sets, top=20)
        else:
            for k in (10, 20):
                results[f"{prefix}/n{k}"] = get_ndcg(prediction, gt_sets, top=k)
                results[f"{prefix}/r{k}"] = get_recall(prediction, gt_sets, top=k)
        return results


# ----------------------------------------------------------------------
# 7-function workload contract
# ----------------------------------------------------------------------

def check_args(args: TrainArgs) -> None:
    if args.early_criterion not in ("loss", "n20", "r20"):
        raise ValueError(f"invalid early_criterion {args.early_criterion}")
    if args.model_name not in ("MLP", "GMF", "NeuMF-end", "NeuMF-pre"):
        raise ValueError(f"invalid model_name {args.model_name}")
    # Without a run to restore, eval/inference would score freshly
    # initialized params (nothing is trained in these modes). Mirrors
    # pmgt_task.check_args / reference base_trainer.py:99-110.
    if args.mode in ("eval", "inference") and args.run_id is None:
        raise ValueError(f"mode {args.mode} requires --run-id")
    if args.model_name == "NeuMF-pre":
        if not (args.extra.get("gmf_run_id") and args.extra.get("mlp_run_id")):
            raise ValueError("NeuMF-pre requires --gmf-run-id and --mlp-run-id")
    if args.extra.get("item_init_emb_path"):
        if args.model_name not in ("NeuMF-end", "MLP"):
            raise ValueError(
                "item_init_emb_path requires model_name NeuMF-end or MLP"
            )


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
        "NCF data: %d train / %d valid / %d test pairs, %d users, %d items",
        len(train_pairs),
        len(valid_pairs),
        len(artifacts.test_pairs),
        nu,
        ni,
    )


def init_model(args: TrainArgs, ctx: Dict[str, Any], trial=None) -> None:
    ctx["task"] = NCFTask(
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
    task: NCFTask = ctx["task"]
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
    """Serving export: full-catalog top-K recommendations per user from
    the best checkpoint, written as an npz of user_ids/item_ids/scores.
    Beyond the reference — its driver wires inference for PMGT only
    (train.py:322-324) — but the production surface of a recommender."""
    task: NCFTask = ctx["task"]
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
