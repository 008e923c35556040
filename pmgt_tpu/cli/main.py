"""CLI: train-pmgt / train-ncf / train-dcn / hp-tuning / preprocess.

Mirrors the reference's click command surface (train.py:18-295, main.py,
hp_tuning.py:113-147) including ``--save-args`` config dumping. The
``train_model`` dispatcher reproduces the reference's workload contract
dispatch (train.py:298-344) and its FAILED-status handling.
"""
from __future__ import annotations

import functools
import logging
import sys
import time
from typing import Dict, Optional

import click

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.train.registry import RunRegistry

logger = logging.getLogger("pmgt_tpu")


def log_elapsed_time(func):
    """reference pmgt/utils/base.py:20-32."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.time()
        result = func(*args, **kwargs)
        elapsed = time.time() - start
        logger.info("elapsed time of %s: %.1fs", func.__name__, elapsed)
        return result

    return wrapper


@click.group()
@click.option(
    "--save-args",
    type=click.Path(),
    default=None,
    help="Save resolved arguments to a JSON file and exit (reference main.py:9-13)",
)
@click.pass_context
def cli(ctx: click.Context, save_args: Optional[str]):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        stream=sys.stderr,
    )
    ctx.ensure_object(dict)
    ctx.obj["save_args"] = save_args


# --------------------------------------------------------------------------
# Common options (reference train.py:18-70)
# --------------------------------------------------------------------------
_common_options = [
    click.option("--seed", type=click.INT, default=0, help="Seed for reproducibility"),
    click.option("--run-id", type=click.STRING, help="Run ID for resume training"),
    click.option("--model-name", type=click.STRING, required=True),
    click.option("--dataset-name", type=click.STRING, required=True),
    click.option("--valid-size", default=0.2, help="validation dataset size"),
    click.option("--num-epochs", type=click.INT, default=20),
    click.option("--optim", type=click.Choice(["adamw", "sgd"]), default="adamw"),
    click.option("--lr", type=click.FLOAT, default=1e-3),
    click.option("--decay", type=click.FLOAT, default=1e-2, help="Weight decay"),
    click.option("--mp-enabled", is_flag=True, default=False, help="bf16 compute"),
    click.option("--early", type=click.INT, default=5, help="Early stopping patience"),
    click.option("--early-criterion", type=click.STRING, default="loss"),
    click.option("--num-workers", type=click.INT, default=0, help="unused on TPU (kept for config compatibility)"),
    click.option("--train-batch-size", type=click.INT, default=256),
    click.option("--test-batch-size", type=click.INT, default=256),
    click.option("--gradient-max-norm", type=click.FLOAT, default=None),
    click.option("--accumulation-step", type=click.INT, default=1),
    click.option("--scheduler-warmup", type=click.FloatRange(0, 1), default=None),
    click.option(
        "--scheduler-type",
        type=click.Choice(
            [
                "linear",
                "cosine",
                "cosine_with_restarts",
                "polynomial",
                "constant",
                "constant_with_warmup",
            ]
        ),
        default=None,
    ),
    click.option(
        "--mode",
        type=click.Choice(["train", "eval", "inference"]),
        default="train",
    ),
    click.option("--inference-result-path", type=click.Path(), default=None),
    click.option("--experiment-name", type=click.STRING, default="baseline"),
    click.option("--run-name", type=click.STRING, default=None),
    click.option("--tags", type=(str, str), multiple=True),
    click.option("--data-dir", type=click.Path(), default="./data"),
    click.option("--log-dir", type=click.Path(), default="./logs"),
    click.option("--run-script", type=click.Path(exists=True), default=None),
    click.option("--num-devices", type=click.INT, default=None, help="TPU devices to use (default: all)"),
    click.option("--coordinator-address", type=click.STRING, default=None,
                 help="multi-host: jax.distributed coordinator host:port "
                 "(or set JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID)"),
    click.option("--num-processes", type=click.INT, default=None, help="multi-host: total process count"),
    click.option("--process-id", type=click.INT, default=None, help="multi-host: this process's index"),
    click.option("--profile-dir", type=click.Path(), default=None, help="jax.profiler trace output dir"),
    click.option("--swa-start", type=click.INT, default=None, help="enable Stochastic Weight Averaging from this epoch"),
    click.option("--eval-init", is_flag=True, default=False,
                 help="evaluate the pristine init as a best-checkpoint "
                 "candidate before any training (for models initialized "
                 "from trained weights, e.g. NeuMF-pre: the fused init can "
                 "outrank every fine-tuned epoch and the reference "
                 "protocol would silently lose it)"),
    click.option("--eval-interval", type=click.INT, default=1,
                 help="evaluate/checkpoint every k epochs; in scan mode "
                 "each k-epoch group runs as ONE device dispatch "
                 "(amortizes the dispatch round trip; patience counts "
                 "evaluation points)"),
    click.option("--ckpt-interval", type=click.INT, default=1,
                 help="save the resumable 'last' checkpoint every k "
                 "evaluation epochs (always on stop/preemption; the "
                 "metric-keyed 'best' checkpoint is unaffected) — for "
                 "large states where per-epoch checkpoint transfer "
                 "dominates the epoch"),
]

_COMMON_KEYS = {
    "seed",
    "run_id",
    "model_name",
    "dataset_name",
    "valid_size",
    "num_epochs",
    "optim",
    "lr",
    "decay",
    "mp_enabled",
    "early",
    "early_criterion",
    "train_batch_size",
    "test_batch_size",
    "gradient_max_norm",
    "accumulation_step",
    "scheduler_warmup",
    "scheduler_type",
    "mode",
    "inference_result_path",
    "experiment_name",
    "run_name",
    "tags",
    "data_dir",
    "log_dir",
    "run_script",
    "num_devices",
    "profile_dir",
    "eval_interval",
    "ckpt_interval",
}


def add_options(options):
    def _add(func):
        for option in reversed(options):
            func = option(func)
        return func

    return _add


def _make_args(raw: Dict) -> TrainArgs:
    raw.pop("num_workers", None)  # host loader workers: meaningless here
    # Multi-host bring-up happens once, before any backend is touched
    # (jax.devices() in the task's make_mesh would otherwise initialize
    # single-process). No-op without a coordinator address.
    from pmgt_tpu.core.mesh import initialize_distributed

    initialize_distributed(
        raw.pop("coordinator_address", None),
        raw.pop("num_processes", None),
        raw.pop("process_id", None),
    )
    base = {k: v for k, v in raw.items() if k in _COMMON_KEYS}
    extra = {k: v for k, v in raw.items() if k not in _COMMON_KEYS}
    base["tags"] = tuple(tuple(t) for t in base.get("tags", ()))
    args = TrainArgs(**base, extra=extra)
    return args


def _dispatch(ctx: click.Context, train_name: str, raw_args: Dict):
    args = _make_args(raw_args)
    if ctx.obj.get("save_args"):
        args.save(ctx.obj["save_args"])
        logger.info("saved args to %s", ctx.obj["save_args"])
        return None
    return train_model(train_name, args)


# --------------------------------------------------------------------------
# train-ncf (reference train.py:84-152)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@add_options(_common_options)
@click.option("--emb-dropout", type=click.FLOAT, default=0.0)
@click.option("--dropout", type=click.FLOAT, default=0.0)
@click.option("--layer-norm-eps", type=click.FLOAT, default=1e-12)
@click.option("--use-layer-norm", is_flag=True, default=False)
@click.option("--alpha", type=click.FLOAT, default=0.5, help="GMF/MLP blend for NeuMF-pre")
@click.option("--factor-num", type=click.INT, default=32)
@click.option("--num-layers", type=click.INT, default=3)
@click.option("--num-ng", type=click.INT, default=1)
@click.option("--max-sample-items", type=click.INT, default=1000)
@click.option("--gmf-run-id", type=click.STRING, default=None)
@click.option("--mlp-run-id", type=click.STRING, default=None)
@click.option("--item-init-emb-path", type=click.Path(exists=True), default=None)
@click.option("--freeze-item-init-emb", is_flag=True, default=False)
@click.option("--normalize-item-init-emb", is_flag=True, default=False)
@click.option("--topk", type=click.INT, default=100,
              help="inference mode: items per user in the serving export")
@click.option("--reference-tiebreak", is_flag=True, default=False,
              help="score eval candidates positives-first with low-index "
                   "tie-break, exactly like the reference (optimistic on "
                   "tied scores; for ±1% published-number comparisons only)")
@click.pass_context
def train_ncf(ctx: click.Context, **raw_args):
    """Train NCF (GMF / MLP / NeuMF-end / NeuMF-pre)."""
    _dispatch(ctx, "ncf", raw_args)


# --------------------------------------------------------------------------
# train-dcn (reference train.py:155-220)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@add_options(_common_options)
@click.option("--emb-dropout", type=click.FLOAT, default=0.0)
@click.option("--dropout", type=click.FLOAT, default=0.0)
@click.option("--layer-norm-eps", type=click.FLOAT, default=1e-12)
@click.option("--use-layer-norm", is_flag=True, default=False)
@click.option("--factor-num", type=click.INT, default=32)
@click.option("--deep-net-num-layers", type=click.INT, default=3)
@click.option("--cross-net-num-layers", type=click.INT, default=3)
@click.option("--num-ng", type=click.INT, default=1)
@click.option("--max-sample-items", type=click.INT, default=5)
@click.option("--item-init-emb-path", type=click.Path(exists=True), default=None)
@click.option("--freeze-item-init-emb", is_flag=True, default=False)
@click.option("--normalize-item-init-emb", is_flag=True, default=False)
@click.option("--topk", type=click.INT, default=100,
              help="inference mode: items per user in the serving export")
@click.pass_context
def train_dcn(ctx: click.Context, **raw_args):
    """Train DCN."""
    _dispatch(ctx, "dcn", raw_args)


# --------------------------------------------------------------------------
# train-pmgt (reference train.py:223-295)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@add_options(_common_options)
@click.option("--max-ctx-neigh", type=click.INT, default=5)
@click.option(
    "--hop-sampling-sizes", type=click.INT, multiple=True, default=[16, 8, 4]
)
@click.option("--max-total-samples", type=click.INT, default=10)
@click.option("--min-neg-samples", type=click.INT, default=5)
@click.option("--hidden-size", type=click.INT, default=128)
@click.option("--intermediate-size", type=click.INT, default=128)
@click.option("--num-hidden-layers", type=click.INT, default=5)
@click.option("--num-attention-heads", type=click.INT, default=1)
@click.option("--beta", type=click.FLOAT, default=0.5)
@click.option("--random-node-ratio", type=click.FLOAT, default=0.2 * 0.1)
@click.option("--mask-node-ratio", type=click.FLOAT, default=0.2 * 0.8)
@click.option(
    "--attention-impl",
    type=click.Choice(["xla", "pallas"]),
    default=None,
    help="dual-attention kernel implementation (default: pallas on TPU, xla elsewhere)",
)
@click.option(
    "--position-embedding-type",
    type=click.Choice(["absolute", "relative_key", "relative_key_query"]),
    default="absolute",
)
@click.option(
    "--gradient-checkpointing",
    is_flag=True,
    default=False,
    help="rematerialize encoder layers in backward",
)
@click.option(
    "--ctx-cache/--no-ctx-cache",
    default=True,
    help="per-epoch context cache (off = exact per-occurrence resampling)",
)
@click.option(
    "--scan-epoch/--no-scan-epoch",
    default=True,
    help="run each epoch as one lax.scan dispatch (off = per-step dispatch "
    "with step-level loss logging)",
)
@click.option(
    "--shard-feat-tables",
    is_flag=True,
    default=False,
    help="shard the frozen feature tables' node axis over the device mesh "
    "(HBM relief at production node counts; XLA inserts the gather "
    "collectives)",
)
@click.option(
    "--shard-graph-tables",
    is_flag=True,
    default=False,
    help="row-shard the per-node graph tables (packed draw rows, neighbor "
    "rows, sorted-member rows) over the device mesh like "
    "--shard-feat-tables; beyond ~2M nodes they are the dominant "
    "unsharded HBM tenant",
)
@click.option(
    "--fusion-strategy",
    type=click.Choice(["auto", "project_tables", "gather_rows"]),
    default="auto",
    help="multimodal-fusion dataflow (identical math): project the whole "
    "frozen table then gather compact rows, or gather raw rows and "
    "project those; auto picks by node count (full-table reads dominate "
    "the step on huge graphs)",
)
@click.option(
    "--feat-tables-dtype",
    type=click.Choice(["float32", "bfloat16", "int8"]),
    default=None,
    help="storage dtype of the frozen feature tables (bfloat16 halves "
    "HBM footprint and the per-step full-table projection read; default "
    "bfloat16 when --mp-enabled — numerically identical there — else "
    "float32; int8 = symmetric per-row quantization, halving storage "
    "and gather traffic again at a bounded max|row|/254 feature error)",
)
@click.pass_context
def train_pmgt(ctx: click.Context, **raw_args):
    """Pre-train PMGT."""
    _dispatch(ctx, "pmgt", raw_args)


# --------------------------------------------------------------------------
# train-pmgt-ncf (end-to-end variant; the reference implements the model
# but never wires a trainer — see tasks/pmgt_ncf_task.py)
# --------------------------------------------------------------------------
@cli.command(context_settings={"show_default": True})
@add_options(_common_options)
@click.option("--emb-dropout", type=click.FLOAT, default=0.0)
@click.option("--dropout", type=click.FLOAT, default=0.0)
@click.option("--factor-num", type=click.INT, default=32)
@click.option("--num-layers", type=click.INT, default=3)
@click.option("--num-ng", type=click.INT, default=1)
@click.option("--max-sample-items", type=click.INT, default=1000)
@click.option("--max-ctx-neigh", type=click.INT, default=5)
@click.option(
    "--hop-sampling-sizes", type=click.INT, multiple=True, default=[16, 8, 4]
)
@click.option("--hidden-size", type=click.INT, default=128)
@click.option("--intermediate-size", type=click.INT, default=128)
@click.option("--num-hidden-layers", type=click.INT, default=5)
@click.option("--num-attention-heads", type=click.INT, default=1)
@click.option("--beta", type=click.FLOAT, default=0.5)
@click.option(
    "--attention-impl", type=click.Choice(["xla", "pallas"]), default=None
)
@click.option(
    "--fusion-strategy",
    type=click.Choice(["auto", "project_tables", "gather_rows"]),
    default="auto",
    help="multimodal-fusion dataflow; auto picks by node count",
)
@click.option(
    "--feat-tables-dtype",
    type=click.Choice(["float32", "bfloat16", "int8"]),
    default=None,
    help="storage dtype of the frozen feature tables feeding the PMGT "
    "item tower (same lever as train-pmgt; default bfloat16 when "
    "--mp-enabled else float32)",
)
@click.option(
    "--shard-feat-tables",
    is_flag=True,
    default=False,
    help="row-shard the frozen feature tables over the device mesh "
    "(same lever as train-pmgt)",
)
@click.option(
    "--shard-graph-tables",
    is_flag=True,
    default=False,
    help="row-shard the per-node graph tables over the device mesh "
    "(same lever as train-pmgt)",
)
@click.option("--topk", type=click.INT, default=100,
              help="inference mode: items per user in the serving export")
@click.option("--serve-user-batch", type=click.INT, default=64,
              help="inference mode: users per serving tile (each pays "
              "user_batch x item_chunk encoder forwards)")
@click.option("--serve-item-chunk", type=click.INT, default=1024,
              help="inference mode: catalog chunk per serving tile")
@click.option("--reference-tiebreak", is_flag=True, default=False,
              help="score eval candidates positives-first with low-index "
                   "tie-break, exactly like the reference (optimistic on "
                   "tied scores; for ±1% published-number comparisons only)")
@click.pass_context
def train_pmgt_ncf(ctx: click.Context, **raw_args):
    """Train PMGT_NCF (end-to-end PMGT item tower inside NCF)."""
    _dispatch(ctx, "pmgt_ncf", raw_args)


# --------------------------------------------------------------------------
# dispatcher (reference train.py:298-344)
# --------------------------------------------------------------------------
@log_elapsed_time
def train_model(
    train_name: str,
    args: TrainArgs,
    is_hptuning: bool = False,
    trial=None,
    enable_trial_pruning: bool = False,
):
    assert train_name in ("ncf", "pmgt", "dcn", "pmgt_ncf")

    if train_name == "ncf":
        from pmgt_tpu.tasks import ncf_task as trainer
    elif train_name == "pmgt":
        from pmgt_tpu.tasks import pmgt_task as trainer
    elif train_name == "pmgt_ncf":
        from pmgt_tpu.tasks import pmgt_ncf_task as trainer
    else:
        from pmgt_tpu.tasks import dcn_task as trainer

    ctx: Dict = {}
    trainer.check_args(args)
    trainer.init_run(args)
    trainer.init_dataloader(args, ctx)
    trainer.init_model(
        args, ctx, trial=trial if enable_trial_pruning else None
    )

    registry = RunRegistry(args.log_dir)
    if args.run_id is not None:
        run = registry.get_run(args.run_id)
    else:
        run = registry.create_run(
            args.experiment_name,
            args.to_dict(),
            run_name=args.run_name,
            tags=dict(args.tags),
            run_script=args.run_script,
        )
        logger.info("run_id: %s", run.run_id)

    # Status is finalized only for runs THIS invocation created:
    # inference/eval against an existing --run-id must not overwrite the
    # original training run's FINISHED/INTERRUPTED record.
    created_run = args.run_id is None

    if args.mode == "inference":
        logger.info("Inference mode")
        try:
            out = trainer.inference(args, ctx, registry, run)
        except Exception:
            if created_run:
                registry.set_status(run, "FAILED")
            raise
        if created_run:
            registry.set_status(run, "FINISHED")
        return out

    try:
        if args.mode == "train":
            if args.profile_dir:
                import jax

                jax.profiler.start_trace(args.profile_dir)
                try:
                    trainer.train(args, ctx, registry, run)
                finally:
                    jax.profiler.stop_trace()
                    logger.info("profiler trace written to %s", args.profile_dir)
            else:
                trainer.train(args, ctx, registry, run)
        if args.mode == "eval":
            logger.info("Eval mode")
        results = trainer.test(args, ctx, registry, run, is_hptuning=is_hptuning)
        # A preempted fit marks the run INTERRUPTED; keep that status so
        # resume/orchestration logic keyed on it is not misled (the test
        # pass above still reports metrics for the partial run).
        if run.status != "INTERRUPTED":
            registry.set_status(run, "FINISHED")
        logger.info("test results: %s", results)
        return results
    except Exception:
        registry.set_status(run, "FAILED")
        raise


@cli.command(context_settings={"show_default": True})
@click.option("--log-dir", type=click.Path(), default="./logs")
@click.option("--experiment-name", type=click.STRING, default=None,
              help="restrict to one experiment")
@click.option("--run-id", type=click.STRING, default=None,
              help="show one run in detail (params, tags, latest metrics)")
def runs(log_dir: str, experiment_name: Optional[str], run_id: Optional[str]):
    """Browse the run registry — the reference's MLflow-UI workflow
    (base_trainer.py:93-110) at the CLI."""
    import json
    import os

    registry = RunRegistry(log_dir)
    if run_id:
        run = registry.get_run(run_id)
        click.echo(
            f"run {run.run_id}  experiment={run.experiment_name}  "
            f"status={run.status}"
        )
        tags_path = os.path.join(run.run_dir, "tags.json")
        if os.path.exists(tags_path):
            with open(tags_path, encoding="utf-8") as f:
                tags = json.load(f)
            click.echo(
                "tags: " + "  ".join(f"{k}={v}" for k, v in tags.items())
            )
        click.echo("params:")
        for k, v in sorted(run.params.items()):
            click.echo(f"  {k} = {v}")
        latest = {}
        for m in run.metrics():
            latest[m["name"]] = m
        if latest:
            click.echo("latest metrics:")
            for name in sorted(latest):
                m = latest[name]
                click.echo(
                    f"  {name} = {m['value']:.6g}"
                    f"  (epoch {m['epoch']}, step {m['step']})"
                )
        from pmgt_tpu.train.checkpoints import read_best_info

        best = read_best_info(run.ckpt_dir)
        if best:
            click.echo(
                f"best: {best.get('monitor')} = {best.get('value'):.6g}"
                f" at epoch {best.get('epoch')}"
            )
        return

    header = f"{'RUN_ID':34} {'EXPERIMENT':16} {'STATUS':12} {'MODEL':12} {'DATASET':10} BEST"
    click.echo(header)
    for run in registry.list_runs(experiment_name):
        params = run.params
        from pmgt_tpu.train.checkpoints import read_best_info

        best = read_best_info(run.ckpt_dir)
        best_str = (
            f"{best.get('monitor')}={best.get('value'):.5g}@{best.get('epoch')}"
            if best
            else "-"
        )
        click.echo(
            f"{run.run_id:34} {run.experiment_name:16} {run.status:12} "
            f"{str(params.get('model_name', '-')):12} "
            f"{str(params.get('dataset_name', '-')):10} {best_str}"
        )


def main():
    # Late imports: registering the hp-tuning and data commands on the
    # group happens on module import (mirroring the repo-root main.py);
    # deferred here so `import pmgt_tpu.cli.main` alone stays cycle-free.
    from pmgt_tpu.cli import data_cmds, hpo  # noqa: F401

    cli(obj={})


if __name__ == "__main__":
    main()
