"""Bisect the NeuMF-pre quality-gate anomaly (VERDICT r4 #1).

QUALITY_{VG,TG}.json showed NeuMF-pre scoring BELOW its own ingredient
GMF/MLP towers. Hypothesis: the gate fine-tunes every NCF family at
lr 1e-3 while the published NeuMF-pre protocol is lr 1e-4 (reference
scripts/run_ncf.sh:10, config/hpo/train_ncf_neumf_pre_params.json) —
at 1e-3 the first updates wash out the pre-trained init.

Protocol: train GMF and MLP (gate HPs), fuse, then fine-tune NeuMF-pre
at a ladder of learning rates; also evaluate the FUSED INIT with zero
fine-tuning (epoch-0 eval) — if the fused init already beats both towers
but fine-tuning at 1e-3 drops below them, the fusion is correct and the
protocol is the bug. Runs on CPU at small scale by default (fast,
platform-agnostic conclusion) or on TPU at the calibrated gate shapes
via --shape.
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)
ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true", help="pin to CPU")
ap.add_argument("--shape", choices=["VG", "TG"], default=None)
ap.add_argument("--num-nodes", type=int, default=800)
ap.add_argument("--num-users", type=int, default=600)
ap.add_argument("--epochs", type=int, default=12)
ap.add_argument("--lrs", default="1e-3,1e-4")
ap.add_argument("--out", default="/tmp/neumf_pre_bisect")
ap.add_argument("--report", default=None)
cli = ap.parse_args()

if cli.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.data.synthetic import (
    make_published_shape_dataset,
    make_synthetic_dataset,
)
from pmgt_tpu.tasks import ncf_task
from pmgt_tpu.train.registry import RunRegistry

OUT = cli.out
os.makedirs(OUT, exist_ok=True)

if cli.shape:
    # Match the quality gate's calibrated per-shape signal
    # (pmgt_tpu.data.synthetic.CALIBRATED_SIGNAL — single source).
    from pmgt_tpu.data.synthetic import CALIBRATED_SIGNAL

    art = make_published_shape_dataset(
        cli.shape, seed=42, signal=CALIBRATED_SIGNAL[cli.shape]
    )
else:
    art = make_synthetic_dataset(
        num_nodes=cli.num_nodes,
        num_users=cli.num_users,
        num_clusters=12,
        feat_dims=(64, 32),
        interactions_per_user=15,
        avg_degree=10,
        seed=42,
    )
reg = RunRegistry(f"{OUT}/logs")
results = {}


def run(name, model_name, lr, num_epochs, extra):
    a = TrainArgs(
        model_name=model_name, dataset_name="Q", seed=0,
        num_epochs=num_epochs,
        train_batch_size=256, test_batch_size=512, lr=lr, decay=0.0,
        early=4, early_criterion="n20", valid_size=0.2, mp_enabled=True,
        gradient_max_norm=5.0, ckpt_interval=1_000_000,
        log_dir=f"{OUT}/logs", extra=dict(extra),
    )
    c = {"artifacts": art}
    ncf_task.check_args(a)
    ncf_task.init_run(a)
    ncf_task.init_dataloader(a, c)
    ncf_task.init_model(a, c)
    r = reg.create_run(name, a.to_dict())
    if num_epochs > 0:
        ncf_task.train(a, c, reg, r)
    t = ncf_task.test(a, c, reg, r)
    results[name] = {"lr": lr, **t}
    print(f"== {name}: {t}")
    return r


base = dict(factor_num=64, num_layers=2, num_ng=1, max_sample_items=500)
gmf_run = run("gmf", "GMF", 1e-3, cli.epochs, base)
mlp_run = run("mlp", "MLP", 1e-3, cli.epochs, base)

pre = dict(base, gmf_run_id=gmf_run.run_id, mlp_run_id=mlp_run.run_id, alpha=0.5)

# Fused init, ZERO fine-tuning (num_epochs=0 + direct evaluate): tests
# fuse_neumf_params behaviorally.
a0 = TrainArgs(
    model_name="NeuMF-pre", dataset_name="Q", seed=0, num_epochs=0,
    train_batch_size=256, test_batch_size=512, lr=1e-4, decay=0.0,
    early=4, early_criterion="n20", valid_size=0.2, mp_enabled=True,
    gradient_max_norm=5.0, ckpt_interval=1_000_000,
    log_dir=f"{OUT}/logs", extra=dict(pre),
)
c0 = {"artifacts": art}
ncf_task.check_args(a0)
ncf_task.init_run(a0)
ncf_task.init_dataloader(a0, c0)
ncf_task.init_model(a0, c0)
t0 = c0["task"].evaluate(c0["task"].state, split="test")
results["neumf_pre_init_only"] = {"lr": 0.0, **t0}
print("== neumf_pre_init_only:", t0)

for lr_s in cli.lrs.split(","):
    # "lr" or "lr:epochs" — the published protocol is lr 1e-4 with a
    # 60-epoch early-10 budget (reference scripts/run_ncf.sh), so the
    # ladder can give the low-lr arm the longer budget it was tuned for.
    epochs = cli.epochs
    if ":" in lr_s:
        lr_s, ep = lr_s.split(":")
        epochs = int(ep)
    lr = float(lr_s)
    run(f"neumf_pre_lr{lr_s}_e{epochs}", "NeuMF-pre", lr, epochs, pre)

gmf_n20 = results["gmf"]["test/n20"]
mlp_n20 = results["mlp"]["test/n20"]
print(json.dumps(results, indent=2, default=float))
print(f"\nmax(GMF, MLP) n20 = {max(gmf_n20, mlp_n20):.4f}")
if cli.report:
    with open(cli.report, "w") as f:
        json.dump(results, f, indent=2, default=float)
