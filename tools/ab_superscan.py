"""Interleaved A/B: lag-1 per-epoch pipelining vs a fused k-epoch scan.

Hypothesis: the axon tunnel executes dispatched work demand-driven (a
fetch forces execution up to the fetched value), so even with lag-1
speculative dispatch the device idles ~one dispatch+fetch round trip per
fetched program (~25 ms at TG scale = the measured 1.2 ms/step
wall-vs-device gap). Fusing k epochs into ONE dispatch
(PMGTTask.train_epochs, engine --eval-interval k) amortizes that round
trip over k epochs.

Variant A — the engine's interval-1 schedule: per-epoch refresh + epoch
scan dispatched speculatively (lag-1 fetch), exactly bench.py's
pipelined loop.
Variant B — task.train_epochs(state, e0, k): refreshes dispatched per
epoch (async), ONE unrolled k-epoch program, one fetch per group.

Both variants run the same k epochs per timed sample with distinct epoch
indices per rep (distinct shuffles/seeds/ctx — tunnel memoization
guard), thread state through, and drain fully at the sample boundary.
Alternated A,B,A,B in one process per the CLAUDE.md A/B rule.

Usage: python tools/ab_superscan.py [--k 6] [--reps 8] [--batch 512]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.data.synthetic import make_synthetic_dataset
from pmgt_tpu.tasks.pmgt_task import PMGTTask


def build_task(batch):
    art = make_synthetic_dataset(
        num_nodes=10834, num_users=100, feat_dims=(1536, 768),
        interactions_per_user=2, avg_degree=16, seed=0,
    )
    targs = TrainArgs(
        model_name="PMGT", dataset_name="ab-superscan", seed=0,
        num_epochs=1, train_batch_size=batch, test_batch_size=batch,
        lr=1e-4, mp_enabled=True, gradient_max_norm=5.0,
        extra=dict(hidden_size=128, intermediate_size=128,
                   num_hidden_layers=5, num_attention_heads=1),
    )
    nodes = np.arange(2, art.num_nodes + 2, dtype=np.int32)
    return PMGTTask(targs, art, nodes, nodes[:batch])


def drain(state, total):
    leaf = jax.tree.leaves(state.params)[0]
    float(np.asarray(jax.device_get(leaf)).ravel()[0])
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    task = build_task(args.batch)
    k = args.k

    def run_a(state, epochs):
        """Engine interval-1 lag-1 pipelined schedule."""
        pend, total = [], 0.0
        for e in epochs:
            task.on_epoch_start(e)
            state, losses = task.train_epoch(state, e)
            pend.append(losses)
            if len(pend) > 1:
                total += float(np.asarray(jax.device_get(pend.pop(0))).sum())
        for p in pend:
            total += float(np.asarray(jax.device_get(p)).sum())
        return state, drain(state, total)

    def run_b(state, epochs):
        """One fused dispatch over the same epochs."""
        state, losses = task.train_epochs(state, epochs[0], len(epochs))
        total = float(np.asarray(jax.device_get(losses)).sum())
        return state, drain(state, total)

    state = task.state
    t0 = time.time()
    state, _ = run_a(state, range(0, k))
    print(f"A compile+warm {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    state, _ = run_b(state, range(k, 2 * k))
    print(f"B compile+warm {time.time()-t0:.0f}s", flush=True)

    n_steps = len(task.train_nodes) // task.args.train_batch_size
    a_ms, b_ms = [], []
    e = 2 * k
    for rep in range(args.reps):
        for name, runner, sink in (("A", run_a, a_ms), ("B", run_b, b_ms)):
            t0 = time.time()
            state, total = runner(state, range(e, e + k))
            dt = time.time() - t0
            e += k
            ms = dt * 1e3 / (n_steps * k)
            sink.append(ms)
            print(f"rep {rep} {name}: {ms:.3f} ms/step (loss sum {total:.1f})",
                  flush=True)

    a, b = np.array(a_ms), np.array(b_ms)
    print(f"\nA (lag-1 per-epoch): median {np.median(a):.3f} ms/step  "
          f"mean {a.mean():.3f}  min {a.min():.3f}")
    print(f"B (fused {k}-epoch scan): median {np.median(b):.3f} ms/step  "
          f"mean {b.mean():.3f}  min {b.min():.3f}")
    bs = task.args.train_batch_size
    print(f"A nodes/sec {bs*1e3/np.median(a):,.0f}  "
          f"B nodes/sec {bs*1e3/np.median(b):,.0f}")


if __name__ == "__main__":
    main()
