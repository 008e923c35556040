"""Interleaved measurement of the engine's epoch-dispatch schedules.

Compares, in ONE process on the same chip weather (the pool-shared chip
drifts ±0.5 ms/step between runs, see CLAUDE.md):

  pipe1    per-epoch dispatch with lag-1 fetch — engine.fit's default
           scan-mode schedule (what bench.py's headline measures)
  groupK   K epochs per device dispatch (task.train_epochs — the
           --eval-interval K fast path), lag-1 fetch at group
           granularity

Grouping is bit-compatible with sequential training (the task consumes
identical PRNG/shuffle/ctx streams; tests assert identical losses and
params) but changes the *evaluation cadence*, so it is an opt-in
(--eval-interval) rather than the default. This tool quantifies what the
opt-in buys: each fetched program still idles the device for one
dispatch+fetch round trip even under lag-1 speculation (execution
through the tunnel is demand-driven), and grouping amortizes that round
trip K-fold.

Usage:
  python tools/bench_group.py --ks 2 4 --epochs 8 --reps 4
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
    args = TrainArgs(
        model_name="PMGT", dataset_name="bench", seed=0, num_epochs=1,
        train_batch_size=batch, test_batch_size=batch, lr=1e-4,
        mp_enabled=True, gradient_max_norm=5.0,
        extra=dict(hidden_size=128, intermediate_size=128,
                   num_hidden_layers=5, num_attention_heads=1),
    )
    nodes = np.arange(2, art.num_nodes + 2, dtype=np.int32)
    return PMGTTask(args, art, nodes, nodes[:batch])


def _drain(pend, total):
    total += float(np.asarray(jax.device_get(pend.pop(0))).sum())
    return total


def run_schedule(task, state, first, n_epochs, k):
    """Run n_epochs epochs starting at ``first``: k=1 is the engine's
    lag-1 per-epoch pipeline, k>1 the grouped --eval-interval path with
    lag-1 fetch at group granularity. Honest per the measurement rule:
    state threads sequentially, every dispatched program's losses are
    fetched (bounded lag), and a param leaf of the final state is
    fetched so the last update cannot be elided."""
    pend = []
    total = 0.0
    for g0 in range(first, first + n_epochs, k):
        if k == 1:
            task.on_epoch_start(g0)
            state, losses = task.train_epoch(state, g0)
        else:
            state, losses = task.train_epochs(state, g0, k)
        pend.append(losses)
        if len(pend) > 1:
            total = _drain(pend, total)
    while pend:
        total = _drain(pend, total)
    leaf = jax.tree.leaves(state.params)[0]
    total += float(np.asarray(jax.device_get(leaf)).ravel()[0])
    jax.block_until_ready(state)
    assert np.isfinite(total)
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--ks", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--epochs", type=int, default=8,
                    help="epochs per timed sample (multiple of every k)")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    ks = [1] + [k for k in args.ks if k != 1]
    for k in ks:
        assert args.epochs % k == 0, f"--epochs must be a multiple of {k}"

    task = build_task(args.batch)
    steps = len(task.train_nodes) // args.batch
    state = task.state

    # warmup/compile every schedule once (grouped programs are distinct
    # jit traces per k)
    epoch = 0
    for k in ks:
        t0 = time.time()
        state = run_schedule(task, state, epoch, 2 * k, k)
        epoch += 2 * k
        print(f"k={k}: compiled+warm in {time.time() - t0:.0f}s", flush=True)

    samples = {k: [] for k in ks}
    for rep in range(args.reps):
        for k in ks:
            t0 = time.perf_counter()
            state = run_schedule(task, state, epoch, args.epochs, k)
            wall = time.perf_counter() - t0
            epoch += args.epochs
            ms = wall * 1e3 / (args.epochs * steps)
            samples[k].append(ms)
            print(f"rep {rep} k={k}: {ms:.3f} ms/step", flush=True)

    print()
    for k in ks:
        s = samples[k]
        med = float(np.median(s))
        print(
            f"k={k}: median {med:.3f} min {min(s):.3f} ms/step "
            f"({args.batch / med * 1e3:,.0f} nodes/sec) over {len(s)} samples"
        )


if __name__ == "__main__":
    main()
