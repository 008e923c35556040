"""Interleaved within-process A/B of the per-epoch whole-graph refresh
(ctx + pair cache rebuild) on TPU — same methodology as tools/ab_step.py
(one jitted lax.scan per sample, per-iteration folded keys, one fetched
scalar, variants alternated A,B,A,B under the same chip weather).

Default comparison: packed single-operand segment sort vs the stable
variadic sort((ids, ws), num_keys=1) in sampling/mcn.py (bit-identical
outputs; see the SORT_IMPL knob there).

Usage:
  python tools/ab_refresh.py [--num-nodes 10834] [--n 20] [--reps 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pmgt_tpu.core.config import SamplingConfig
from pmgt_tpu.data.synthetic import make_synthetic_dataset
from pmgt_tpu.graph.container import PaddedGraph
from pmgt_tpu.sampling import mcn
from pmgt_tpu.sampling.pairs import sample_all_contexts, sample_all_pairs


def build_runner(cfg, n_total, n, chunk=None):
    def one_refresh(graph, nodes, key):
        ids, mask = sample_all_contexts(
            graph, key, cfg, n_total, all_nodes=nodes, chunk=chunk
        )
        pn, pl, pv = sample_all_pairs(
            graph, jax.random.fold_in(key, 1), cfg, n_total,
            is_training=True,
        )
        return (
            jnp.sum(ids) + jnp.sum(pn)
            + jnp.sum(mask) + jnp.sum(pl) + jnp.sum(pv)
        ).astype(jnp.float32)

    def run(graph, nodes, key):
        def body(acc, i):
            return acc + one_refresh(graph, nodes, jax.random.fold_in(key, i)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-nodes", type=int, default=10834)
    ap.add_argument("--avg-degree", type=int, default=16)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--force-topk", choices=("iterative", "xla"),
                    default=None,
                    help="pin mcn.TOPK_IMPL on BOTH sides (disentangles "
                    "the --ab chunk comparison from the row-count top-k "
                    "gate)")
    ap.add_argument("--ab", choices=("sort", "draw", "draw16", "topk",
                                     "chunk"),
                    default="sort",
                    help="which knob to A/B: the segment-sort impl "
                    "(packed vs variadic), the row-draw gather impl "
                    "(fused draw_packed vs legacy three-gather split), "
                    "the narrow 16-bit-id row layout (draw_packed16 vs "
                    "draw_packed), the scorer top-k impl (iterated "
                    "masked argmax vs XLA's sort-based lax.top_k), or "
                    "the adaptive refresh chunk (fixed 65,536 vs the "
                    "budgeted size; only meaningful with "
                    "--num-nodes > 65,536)")
    args = ap.parse_args()

    from pmgt_tpu.graph import container

    if args.ab in ("draw", "draw16"):
        # Materialize ALL draw-table variants so each traced path reads
        # its own real tables.
        container.KEEP_SPLIT_TABLES = args.ab == "draw"
        container.KEEP_WIDE_PACKED = True
    art = make_synthetic_dataset(
        num_nodes=args.num_nodes, num_users=100, feat_dims=(8, 8),
        interactions_per_user=2, avg_degree=args.avg_degree, seed=0,
    )
    container.KEEP_SPLIT_TABLES = False
    container.KEEP_WIDE_PACKED = False
    graph = PaddedGraph(*(jnp.asarray(a) for a in art.graph))
    cfg = SamplingConfig()
    n_total = graph.nbr_ids.shape[0]
    nodes = jnp.arange(n_total, dtype=jnp.int32)
    key = jax.random.key(11)

    from pmgt_tpu.sampling import pairs as pairs_mod

    if args.ab == "sort":
        target, knob, variants = mcn, "SORT_IMPL", (
            ("A:packed", "packed"), ("B:variadic", "variadic")
        )
    elif args.ab == "topk":
        target, knob, variants = mcn, "TOPK_IMPL", (
            ("A:iterative", "iterative"), ("B:xla", "xla")
        )
    elif args.ab == "draw16":
        target, knob, variants = mcn, "DRAW_IMPL", (
            ("A:packed", "packed"), ("B:packed16", "packed16")
        )
    elif args.ab == "chunk":
        # A = the full 65,536 chunk, B = a halved 32,768 chunk (the
        # memory-pressure fallback). Measured verdict (100k nodes, n=10,
        # 4 reps, every rep, with --force-topk xla to rule the top-k
        # gate out): B is ~1.9x SLOWER (381 vs 202 ms/refresh) — chunk
        # latency dominates, so effective_refresh_chunk only shrinks
        # under real HBM pressure.
        target, knob, variants = (
            pairs_mod, "_AB_CHUNK",
            (("A:chunk65536", None), ("B:chunk32768", 32768)),
        )
    else:
        target, knob, variants = mcn, "DRAW_IMPL", (
            ("A:packed", "packed"), ("B:split", "split")
        )
    knob_default = getattr(target, knob, None)
    if args.force_topk:
        mcn.TOPK_IMPL = args.force_topk
    runners = {}
    for name, impl in variants:
        setattr(target, knob, impl)
        chunk = impl if args.ab == "chunk" else None
        if args.ab == "chunk":
            print(f"{name}: chunk = {chunk or pairs_mod.REFRESH_CHUNK}",
                  flush=True)
        fn = build_runner(cfg, n_total, args.n, chunk=chunk)
        t0 = time.time()
        float(fn(graph, nodes, key))  # traces NOW with the knob set
        print(f"{name}: compiled+warm in {time.time()-t0:.0f}s", flush=True)
        runners[name] = fn
    if knob_default is not None:
        setattr(target, knob, knob_default)

    samples = {n: [] for n in runners}
    r = 0
    for rep in range(args.reps):
        for name, fn in runners.items():
            r += 1
            k = jax.random.fold_in(key, 10_000 + r)
            t0 = time.perf_counter()
            float(fn(graph, nodes, k))
            ms = (time.perf_counter() - t0) * 1e3 / args.n
            samples[name].append(ms)
            print(f"rep {rep} {name}: {ms:.3f} ms/refresh", flush=True)
    for name, s in samples.items():
        print(
            f"{name}: median {np.median(s):.3f} min {min(s):.3f}"
            f" ms/refresh over {len(s)} samples"
        )


if __name__ == "__main__":
    main()
