"""DCN gate sensitivity study (VERDICT r4 #3).

The calibrated quality gate targets the NeuMF N@20 lift; its DCN arm
lands +0.87 pts (VG) / +0.31 (TG) vs the published +4.9 / +1.0 — so the
open question is whether a DCN-path fidelity regression would be VISIBLE
at the calibrated signal, or vanish inside that mismatch. This study
answers it directly: inject known fidelity nerfs into the PMGT
embeddings feeding the DCN arm and measure whether the gate's AUC delta
tracks them above seed noise.

Arms (per downstream seed 0/1/2, all in ONE process so every DCN run
after the first reuses the compiled jits):
  plain   — no PMGT embeddings (the gate's baseline arm)
  real    — the exported PMGT embeddings (the gate's treatment arm)
  nerf50  — 0.5*emb + 0.5*emb[perm]: half the embedding signal replaced
            by another node's (a ~50%-fidelity regression; norms stay
            in-distribution)
  zero    — zeros (total regression; must land at ~plain)

Verdict criterion: mean_delta(real) - mean_delta(nerf50) > 2 * sigma of
the per-seed paired deltas — i.e. a half-lift DCN regression is
detectable above seed noise at the calibrated shape.

Usage: python tools/dcn_sensitivity.py --shape TG [--emb-path <npy>]
Ref: reference README.md:61-69 (published DCN lifts), dcn/trainer.py.
"""
import argparse
import json
import logging
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)
ap = argparse.ArgumentParser()
ap.add_argument("--shape", choices=["VG", "TG"], default="TG")
ap.add_argument("--signal", type=float, default=None)
ap.add_argument("--pmgt-epochs", type=int, default=8)
ap.add_argument("--downstream-epochs", type=int, default=12)
ap.add_argument("--seeds", default="0,1,2")
ap.add_argument("--emb-path", default=None,
                help="reuse a previously exported PMGT embedding npy "
                "(skips the pretrain stage)")
ap.add_argument("--freeze", action="store_true",
                help="freeze the injected embeddings in the variant arms "
                "(--freeze-item-init-emb): the DETECTOR protocol. Under "
                "the reference's trainable protocol (run_dcn.sh) the "
                "model trains the init away and the arm reads embedding "
                "SCALE, not content; frozen arms read content directly")
ap.add_argument("--out", default="/tmp/dcn_sensitivity")
ap.add_argument("--report", default=None)
cli = ap.parse_args()

import numpy as np

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.data.synthetic import make_published_shape_dataset
from pmgt_tpu.tasks import dcn_task
from pmgt_tpu.train.registry import RunRegistry

# The gate's calibrated per-shape signal (single source of truth).
from pmgt_tpu.data.synthetic import CALIBRATED_SIGNAL

OUT = cli.out
os.makedirs(OUT, exist_ok=True)
signal = cli.signal if cli.signal is not None else CALIBRATED_SIGNAL[cli.shape]
art = make_published_shape_dataset(cli.shape, seed=42, signal=signal)
print(f"dataset: {art.num_nodes} nodes, {art.num_users} users, "
      f"signal {signal}", flush=True)
reg = RunRegistry(f"{OUT}/logs")

# ---------------- PMGT embeddings (gate protocol) ----------------
if cli.emb_path:
    emb_path = cli.emb_path
    print(f"reusing embeddings from {emb_path}", flush=True)
else:
    from pmgt_tpu.tasks import pmgt_task

    a = TrainArgs(
        model_name="PMGT", dataset_name="Q", seed=0,
        num_epochs=cli.pmgt_epochs,
        train_batch_size=256, test_batch_size=512, lr=1e-4, decay=1e-2,
        early=5, early_criterion="auc", valid_size=0.1, mp_enabled=True,
        gradient_max_norm=5.0, ckpt_interval=1_000_000,
        log_dir=f"{OUT}/logs",
        extra=dict(hidden_size=128, intermediate_size=128,
                   num_hidden_layers=5),
    )
    c = {"artifacts": art}
    pmgt_task.check_args(a)
    pmgt_task.init_run(a)
    pmgt_task.init_dataloader(a, c)
    pmgt_task.init_model(a, c)
    run = reg.create_run("PMGT", a.to_dict())
    res = pmgt_task.train(a, c, reg, run)
    print("PMGT:", res, flush=True)
    emb_path = f"{OUT}/node_feat_128dim.npy"
    a.inference_result_path = emb_path
    pmgt_task.inference(a, c, reg, run)

# ---------------- embedding variants ----------------
emb = np.load(emb_path)
rng = np.random.default_rng(0)
perm = rng.permutation(len(emb))
variants = {
    "real": emb,
    "nerf50": 0.5 * emb + 0.5 * emb[perm],
    "zero": np.zeros_like(emb),
}
paths = {}
for name, arr in variants.items():
    p = f"{OUT}/emb_{name}.npy"
    np.save(p, arr.astype(np.float32))
    paths[name] = p


def run_dcn(tag, seed, emb_p):
    """One DCN run with the quality gate's exact HPs
    (tools/validate_pipeline.py DCN section)."""
    extra = dict(
        factor_num=32, deep_net_num_layers=2, cross_net_num_layers=3,
        num_ng=1, max_sample_items=5, emb_dropout=0.2, use_layer_norm=True,
    )
    if emb_p:
        extra.update(item_init_emb_path=emb_p, normalize_item_init_emb=True,
                     freeze_item_init_emb=cli.freeze)
    a = TrainArgs(
        model_name="DCN", dataset_name="Q", seed=seed,
        num_epochs=cli.downstream_epochs,
        train_batch_size=256, test_batch_size=512, lr=1e-3, decay=1e-3,
        early=4, early_criterion="auc", valid_size=0.2, mp_enabled=True,
        gradient_max_norm=5.0, ckpt_interval=1_000_000,
        log_dir=f"{OUT}/logs", extra=extra,
    )
    c = {"artifacts": art}
    dcn_task.check_args(a)
    dcn_task.init_run(a)
    dcn_task.init_dataloader(a, c)
    dcn_task.init_model(a, c)
    r = reg.create_run(tag, a.to_dict())
    dcn_task.train(a, c, reg, r)
    t = dcn_task.test(a, c, reg, r)
    print(f"== {tag}: {t}", flush=True)
    return t["test/auc"]


seeds = [int(s) for s in cli.seeds.split(",")]
auc = {}
for seed in seeds:
    auc[("plain", seed)] = run_dcn(f"dcn_plain_s{seed}", seed, None)
    for name in variants:
        auc[(name, seed)] = run_dcn(
            f"dcn_{name}_s{seed}", seed, paths[name]
        )

# ---------------- analysis ----------------
deltas = {
    name: [
        (auc[(name, s)] - auc[("plain", s)]) * 100 for s in seeds
    ]  # AUC pts
    for name in variants
}
mean = {k: float(np.mean(v)) for k, v in deltas.items()}
# Paired per-seed noise of the regression CONTRAST (real - nerf50): the
# quantity the gate must resolve.
contrast = [
    (auc[("real", s)] - auc[("nerf50", s)]) * 100 for s in seeds
]
sigma = float(np.std(contrast, ddof=1))
detectable = bool(np.mean(contrast) > 2 * sigma)

report = {
    "what": "DCN gate sensitivity: known fidelity nerfs injected into "
            "the PMGT embeddings feeding the gate's DCN arm",
    "shape": cli.shape,
    "signal": signal,
    "freeze": cli.freeze,
    "git_commit": subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip(),
    "auc": {f"{k[0]}_s{k[1]}": round(v, 5) for k, v in auc.items()},
    "lift_pts": {k: [round(x, 3) for x in v] for k, v in deltas.items()},
    "mean_lift_pts": {k: round(v, 3) for k, v in mean.items()},
    "real_minus_nerf50_pts": [round(x, 3) for x in contrast],
    "contrast_mean_pts": round(float(np.mean(contrast)), 3),
    "contrast_sigma_pts": round(sigma, 3),
    "half_lift_regression_detectable_at_2sigma": detectable,
}
print(json.dumps(report, indent=1))
if cli.report:
    with open(cli.report, "w") as f:
        json.dump(report, f, indent=1)
