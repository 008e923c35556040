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
from pmgt_tpu.core.mesh import (
    gather_to_host,
    pad_to_multiple,
    put_along_data_axis,
    replicate_host,
)
from pmgt_tpu.tasks.interaction_base import InteractionTaskBase, TrainState
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

    def evaluate(self, state, split: str = "valid") -> Dict[str, float]:
        params = state.params if isinstance(state, TrainState) else state
        users, items, labels = self._eval_arrays[
            "valid" if split == "valid" else "test"
        ]
        bs = self.args.test_batch_size
        # every dispatched chunk is padded to one fixed device-divisible
        # length (bs itself may not be a mesh multiple)
        target = pad_to_multiple(bs, self.mesh.size)
        probs = []
        losses = []
        rep_params = replicate_host(self.mesh, params)
        for i in range(0, len(users), bs):
            sl = slice(i, i + bs)
            u, it, lb = users[sl], items[sl], labels[sl]
            pad = target - len(u)
            if pad:
                u = np.concatenate([u, np.zeros(pad, u.dtype)])
                it = np.concatenate([it, np.zeros(pad, it.dtype)])
            logits = gather_to_host(
                self._score_fn(
                    rep_params,
                    put_along_data_axis(self.mesh, u.astype(np.int32)),
                    put_along_data_axis(self.mesh, it.astype(np.int32)),
                )
            )[: len(labels[sl])]
            bce = np.maximum(logits, 0) - logits * lb + np.log1p(
                np.exp(-np.abs(logits))
            )
            losses.append(bce.mean())
            probs.append(stable_sigmoid(logits))

        probs = np.concatenate(probs)
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
