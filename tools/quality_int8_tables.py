"""Quality spot-check for --feat-tables-dtype int8 on TPU at TG shape.

Trains the PMGT pretrain task twice from the same seed — once with bf16
tables (the mp-enabled default) and once with int8 row-quantized tables
(core/quant.py) — and compares the val-AUC trajectory. The quantization
error is bounded (max|row|/254 per element), so AUC should track within
seed-noise; this script is the measured evidence behind shipping int8 as
a production storage lever.

Usage:  python tools/quality_int8_tables.py [--epochs 8] [--num-nodes 10834]
Output: one JSON line per variant + a verdict line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.data.synthetic import make_synthetic_dataset
from pmgt_tpu.tasks.pmgt_task import PMGTTask


def run(art, dtype, epochs, batch):
    args = TrainArgs(
        model_name="PMGT", dataset_name="q", seed=0, num_epochs=epochs,
        train_batch_size=batch, test_batch_size=batch, lr=1e-4,
        mp_enabled=True, gradient_max_norm=5.0,
        extra=dict(
            hidden_size=128, intermediate_size=128, num_hidden_layers=5,
            feat_tables_dtype=dtype,
        ),
    )
    n = art.num_nodes
    nodes = np.arange(2, n + 2, dtype=np.int32)
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    split = int(n * 0.9)
    task = PMGTTask(
        args, art, nodes[perm[:split]], nodes[perm[split:]]
    )
    state = task.state
    aucs, losses = [], []
    t0 = time.time()
    for epoch in range(epochs):
        state, epoch_losses = task.train_epoch(state, epoch)
        m = task.evaluate(state)
        aucs.append(m["val/auc"])
        losses.append(float(np.mean(np.asarray(epoch_losses))))
        print(f"[{dtype}] epoch {epoch}: loss {losses[-1]:.4f} "
              f"val_auc {aucs[-1]:.4f}", flush=True)
    out = {
        "dtype": dtype,
        "val_auc": aucs,
        "train_loss": losses,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--num-nodes", type=int, default=10834)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    art = make_synthetic_dataset(
        num_nodes=args.num_nodes, num_users=100, feat_dims=(1536, 768),
        interactions_per_user=2, avg_degree=16, seed=0,
    )
    res = [run(art, d, args.epochs, args.batch) for d in ("bfloat16", "int8")]
    d = res[1]["val_auc"][-1] - res[0]["val_auc"][-1]
    print(json.dumps({
        "final_auc_bf16": res[0]["val_auc"][-1],
        "final_auc_int8": res[1]["val_auc"][-1],
        "delta": round(d, 5),
    }))


if __name__ == "__main__":
    main()
