"""Interleaved within-process A/B of two train-step configurations on TPU.

Cross-process A/Bs on the pool-shared chip confound variant effects with
chip-load drift (±0.5 ms/step observed between runs minutes apart). This
harness compiles the full train step for BOTH configurations in one
process, then alternates timed executions A,B,A,B,... with per-rep
distinct keys (tunnel memoization guard), so both variants see the same
chip weather.

Timing per the CLAUDE.md measurement rule: each sample is ONE jitted
lax.scan of n steps, state threaded through the scan (real data
dependencies), every metric leaf reduced into one fetched scalar.

Usage (B-side config overrides as key=value extras; A is the default):
  python tools/ab_step.py --b attention_impl=xla
  python tools/ab_step.py --b hidden_size=256 --batch 1024

Round-3 verdicts measured with this harness (B=512, TG scale):
  - scatter-free fused project+gather backward: +1.3 ms/step WORSE
    (10.64 -> 11.97 median; raw-row re-gather of the 1536/768-wide
    tables costs more than the 2 x 0.25 ms scatter-adds it removed).
  - attention residual stash (p1/p2/cos stashed fwd->bwd): +0.3 ms/step
    WORSE (11.26 -> 11.53 median; the recompute backward is
    bandwidth-bound, so skipping its FLOPs buys nothing and the
    residual I/O adds cost). Both variants were removed again.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jax import flatten_util

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.data.synthetic import make_synthetic_dataset
from pmgt_tpu.tasks.pmgt_task import PMGTTask


def _parse_extra(pairs):
    out = {}
    for p in pairs:
        k, v = p.split("=", 1)
        for cast in (int, float):
            try:
                v = cast(v)
                break
            except ValueError:
                continue
        out[k] = v
    return out


def build_task(art, batch, extra_overrides):
    extra = dict(
        hidden_size=128, intermediate_size=128, num_hidden_layers=5
    )
    extra.update(extra_overrides)
    batch = extra.pop("batch", batch)  # "batch=N" override for B-side
    args = TrainArgs(
        model_name="PMGT", dataset_name="bench", seed=0, num_epochs=1,
        train_batch_size=batch, test_batch_size=batch, lr=1e-4,
        mp_enabled=True, gradient_max_norm=5.0, extra=extra,
    )
    nodes = np.arange(2, art.num_nodes + 2, dtype=np.int32)
    return PMGTTask(args, art, nodes, nodes[:batch])


def build_runner(task, n):
    """One jitted scan of n full train steps, state threaded, scalar out."""

    def run(state, graph, feat_tables, ctx, targets, key):
        def body(carry, i):
            state, acc = carry
            k_i = jax.random.fold_in(key, i)
            state, metrics = task._train_step_impl(
                state, graph, feat_tables, targets, k_i, ctx, accum=1
            )
            flat, _ = flatten_util.ravel_pytree(
                jax.tree.map(
                    lambda l: jnp.sum(l.astype(jnp.float32)), metrics
                )
            )
            return (state, acc + jnp.sum(flat)), None

        (state, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)), jnp.arange(n)
        )
        return acc

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", nargs="+", default=[],
                    help="key=value TrainArgs.extra overrides for variant B")
    ap.add_argument("--common", nargs="+", default=[],
                    help="key=value extras applied to BOTH variants "
                    "(e.g. ctx_cache=0 to A/B in exact mode)")
    ap.add_argument("--b-sort-impl", default=None,
                    choices=("packed", "variadic"),
                    help="force sampling.mcn.SORT_IMPL while tracing "
                    "variant B (A traces with the default 'auto')")
    ap.add_argument("--b-draw-impl", default=None,
                    choices=("packed16", "packed", "split"),
                    help="force sampling.mcn.DRAW_IMPL while tracing "
                    "variant B; builds the graph with all draw-table "
                    "variants materialized")
    ap.add_argument("--a-draw-impl", default=None,
                    choices=("packed16", "packed", "split"),
                    help="force sampling.mcn.DRAW_IMPL while tracing "
                    "variant A (default: 'auto'); use with "
                    "--b-draw-impl to pin both sides, e.g. "
                    "--a-draw-impl packed --b-draw-impl packed16 when "
                    "auto already resolves to packed16")
    ap.add_argument("--b-topk-impl", default=None,
                    choices=("iterative", "xla"),
                    help="force sampling.mcn.TOPK_IMPL while tracing "
                    "variant B (A traces with the default 'auto'); "
                    "combine with --common ctx_cache=0 for the "
                    "exact-mode step where the scorer top-k is hot")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--num-nodes", type=int, default=10834,
                    help="graph size (default: TG scale; use e.g. 100000 "
                    "to A/B levers whose effect scales with N, like "
                    "fusion_strategy)")
    ap.add_argument("--avg-degree", type=int, default=16)
    args = ap.parse_args()

    if args.b_draw_impl or args.a_draw_impl:
        from pmgt_tpu.graph import container
        container.KEEP_SPLIT_TABLES = True
        container.KEEP_WIDE_PACKED = True
    art = make_synthetic_dataset(
        num_nodes=args.num_nodes, num_users=100, feat_dims=(1536, 768),
        interactions_per_user=2, avg_degree=args.avg_degree, seed=0,
    )
    if args.b_draw_impl or args.a_draw_impl:
        container.KEEP_SPLIT_TABLES = False
        container.KEEP_WIDE_PACKED = False
    common = _parse_extra(args.common)
    variants = {"A": dict(common), "B": {**common, **_parse_extra(args.b)}}
    key = jax.random.key(9)

    runners = {}
    for name, overrides in variants.items():
        if args.b_sort_impl:
            from pmgt_tpu.sampling import mcn
            mcn.SORT_IMPL = args.b_sort_impl if name == "B" else "auto"
        if args.b_draw_impl or args.a_draw_impl:
            from pmgt_tpu.sampling import mcn
            mcn.DRAW_IMPL = (
                (args.b_draw_impl or "auto") if name == "B"
                else (args.a_draw_impl or "auto")
            )
        if args.b_topk_impl:
            from pmgt_tpu.sampling import mcn
            mcn.TOPK_IMPL = args.b_topk_impl if name == "B" else "auto"
        task = build_task(art, args.batch, overrides)
        ctx = task._get_ctx(("train", 0))
        batch = task.args.train_batch_size
        targets = jnp.arange(2, 2 + batch, dtype=jnp.int32)
        fn = build_runner(task, args.n)
        t0 = time.time()
        float(fn(task.state, task.graph, task.feat_tables, ctx, targets,
                 key))
        print(f"{name} {overrides or '(default)'}: compiled+warm "
              f"in {time.time()-t0:.0f}s", flush=True)
        runners[name] = (
            fn, task.state, task.graph, task.feat_tables, ctx, targets
        )
    if args.b_sort_impl:
        from pmgt_tpu.sampling import mcn
        mcn.SORT_IMPL = "auto"  # both variants are traced; restore
    if args.b_draw_impl or args.a_draw_impl:
        from pmgt_tpu.sampling import mcn
        mcn.DRAW_IMPL = "auto"
    if args.b_topk_impl:
        from pmgt_tpu.sampling import mcn
        mcn.TOPK_IMPL = "auto"

    samples = {n: [] for n in variants}
    r = 0
    for rep in range(args.reps):
        for name in variants:
            r += 1
            fn, state, graph, ft, ctx, targets = runners[name]
            k = jax.random.fold_in(key, 10_000 + r)
            t0 = time.perf_counter()
            float(fn(state, graph, ft, ctx, targets, k))
            ms = (time.perf_counter() - t0) * 1e3 / args.n
            samples[name].append(ms)
            print(f"rep {rep} {name}: {ms:.3f} ms/step", flush=True)
    for name in variants:
        s = samples[name]
        batch = len(runners[name][5])
        print(
            f"{name}: median {np.median(s):.3f} min {min(s):.3f} "
            f"ms/step over {len(s)} samples "
            f"({batch / np.median(s) * 1e3:,.0f} nodes/sec)"
        )


if __name__ == "__main__":
    main()
