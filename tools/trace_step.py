"""Device-side per-op decomposition of the cached train step.

Captures an xplane trace of ONE jitted lax.scan of train steps (the same
honest shape as the sustained bench: per-iteration folded keys, real data
dependencies, scalar fetch) and aggregates TPU op time by HLO category
and by individual op. Host-side timing can't see inside the step; this
is the ground truth for "where do the ~11 ms go".

Usage:
    python tools/trace_step.py [--batch 512] [--steps 20] [--out JSON]
    python tools/trace_step.py --fwd-bwd-only   # trace grads alone

Parsing recipe (CLAUDE.md): the tensorboard plugin's converter is
version-broken; read the xplane proto directly with the pure-python
protobuf impl.
"""
import argparse
import glob
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_task(batch, num_nodes=10834, avg_degree=16):
    import numpy as np

    from pmgt_tpu.core.config import TrainArgs
    from pmgt_tpu.data.synthetic import make_synthetic_dataset
    from pmgt_tpu.tasks.pmgt_task import PMGTTask

    art = make_synthetic_dataset(
        num_nodes=num_nodes, num_users=100, feat_dims=(1536, 768),
        interactions_per_user=2, avg_degree=avg_degree, seed=0,
    )
    args = TrainArgs(
        model_name="PMGT", dataset_name="bench", seed=0, num_epochs=1,
        train_batch_size=batch, test_batch_size=batch, lr=1e-4,
        mp_enabled=True, gradient_max_norm=5.0,
        extra=dict(hidden_size=128, intermediate_size=128,
                   num_hidden_layers=5),
    )
    nodes = np.arange(2, art.num_nodes + 2, dtype=np.int32)
    return PMGTTask(args, art, nodes, nodes[:batch])


def run_traced(task, batch, steps, trace_dir, fwd_bwd_only=False,
               exact=False):
    import jax
    import jax.numpy as jnp
    from jax import flatten_util

    from pmgt_tpu.sampling.pairs import make_pretrain_batch_cached

    # exact mode: per-occurrence context/pair sampling INSIDE the step
    # (ctx_cache=False semantics) — trace where its ~2x cost vs the
    # cached step goes.
    ctx = None if exact else task._get_ctx(("train", 0))
    targets = jnp.arange(2, 2 + batch, dtype=jnp.int32)
    scfg = task.sampling
    graph = task.graph

    # feat_tables MUST enter as a jit parameter, not a closure capture:
    # captured arrays are baked into the program as constants, which
    # pushes the hot-path table gather off the TPU fast path and scales
    # the compile payload with the graph (see pmgt_task's graph-as-
    # parameter fix) — a gather_rows trace at --num-nodes >= 50k would
    # otherwise be unrepresentative of the production step.
    if fwd_bwd_only:
        def one(state, g, ft, c, t, k):
            def loss(p):
                b = make_pretrain_batch_cached(
                    g, c[0], c[1], t, k, scfg, True, pair_cache=c[2]
                )
                out = task.model.apply(
                    {"params": p}, ft, b,
                    deterministic=False, compute_nfr=True,
                    rngs={"dropout": k, "corruption": k},
                )
                return out.loss
            return jax.grad(loss)(state.params)
    else:
        def one(state, g, ft, c, t, k):
            return task._train_step_impl(
                state, g, ft, t, k, c, accum=1
            )

    @jax.jit
    def scan_steps(state, g, ft, c, t, key):
        def body(acc, i):
            out = one(state, g, ft, c, t, jax.random.fold_in(key, i))
            flat, _ = flatten_util.ravel_pytree(
                jax.tree.map(lambda l: jnp.sum(l.astype(jnp.float32)), out)
            )
            return acc + jnp.sum(flat), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(steps))
        return acc

    key = jax.random.key(3)
    args = (task.state, graph, task.feat_tables, ctx, targets, key)
    float(scan_steps(*args))  # compile + warm outside the trace
    timed = (task.state, graph, task.feat_tables, ctx, targets,
             jax.random.fold_in(key, 77))
    with jax.profiler.trace(trace_dir):
        float(scan_steps(*timed))


def run_traced_refresh(task, steps, trace_dir):
    """Trace the per-epoch ctx+pair cache refresh (one 'step' = one full
    whole-graph refresh) — the amortized-per-epoch device cost the step
    trace cannot see."""
    import jax
    import jax.numpy as jnp

    from pmgt_tpu.sampling.pairs import sample_all_contexts, sample_all_pairs

    @jax.jit
    def refresh(graph, nodes, seed):
        ids, mask = sample_all_contexts(
            graph, jax.random.key(seed), task.sampling,
            nodes.shape[0], all_nodes=nodes,
        )
        pn, pl, pv = sample_all_pairs(
            graph, jax.random.fold_in(jax.random.key(seed), 1),
            task.sampling, nodes.shape[0], is_training=True,
        )
        return (
            jnp.sum(ids) + jnp.sum(pn)
            + jnp.sum(mask) + jnp.sum(pl) + jnp.sum(pv)
        ).astype(jnp.float32)

    @jax.jit
    def scan_refreshes(graph, nodes, seed0):
        def body(acc, i):
            return acc + refresh(graph, nodes, seed0 + i), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(steps, dtype=jnp.uint32)
        )
        return acc

    graph, nodes = task.graph, task._all_nodes
    float(scan_refreshes(graph, nodes, jnp.uint32(5)))  # compile + warm
    with jax.profiler.trace(trace_dir):
        float(scan_refreshes(graph, nodes, jnp.uint32(99)))


def parse_xplane(trace_dir, steps):
    """Aggregate TPU op time by HLO category / op name from the newest
    xplane.pb under trace_dir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    device_planes = [
        p for p in space.planes
        if "TPU" in p.name and "host" not in p.name.lower()
    ]
    if not device_planes:
        raise RuntimeError(
            f"no TPU plane; planes = {[p.name for p in space.planes]}"
        )
    import re

    by_cat = defaultdict(float)
    by_op = defaultdict(lambda: [0.0, 0, "?"])
    total_ps = 0.0
    module_ps = 0.0
    for plane in device_planes:
        meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        for line in plane.lines:
            # NB exact match: "Async XLA Ops" holds overlapping async
            # spans (DMA windows) that would double-count wildly;
            # "XLA Modules" gives the whole-dispatch device time.
            if line.name == "XLA Modules":
                module_ps += sum(e.duration_ps for e in line.events)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = meta[ev.metadata_id]
                if m.name.startswith("%while"):
                    continue  # the scan wrapper contains everything else
                dur = ev.duration_ps
                total_ps += dur
                cat = None
                for st in list(ev.stats) + list(m.stats):
                    name = stat_meta[st.metadata_id].name
                    if name == "hlo_category":
                        cat = st.str_value or None
                        break
                by_cat[cat or _guess_category(m.name)] += dur
                short = re.match(r"%?([a-zA-Z0-9_.\-]+)", m.name).group(1)
                rec = by_op[short]
                rec[0] += dur
                rec[1] += 1
                rec[2] = cat or "?"
    to_ms = lambda ps: ps / 1e9  # noqa: E731
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    ops = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:40]
    return {
        "trace": paths[-1],
        "steps": steps,
        "device_ms_per_step": to_ms(module_ps) / steps,
        "sum_of_ops_ms_per_step": to_ms(total_ps) / steps,
        "by_category_ms_per_step": {
            k: round(to_ms(v) / steps, 4) for k, v in cats
        },
        "top_ops_ms_per_step": {
            k: {"ms": round(to_ms(d) / steps, 4), "category": c}
            for k, (d, n, c) in ops
        },
    }


def _guess_category(name):
    n = name.lower()
    for key in ("fusion", "gather", "scatter", "dot", "convolution",
                "all-reduce", "copy", "convert", "rng", "sort", "reduce",
                "custom-call", "dynamic"):
        if key in n:
            return key
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--num-nodes", type=int, default=10834,
                   help="synthetic graph size (default: TG scale)")
    p.add_argument("--avg-degree", type=int, default=16)
    p.add_argument("--fwd-bwd-only", action="store_true")
    p.add_argument("--exact", action="store_true",
                   help="trace the exact per-occurrence sampling step "
                   "(ctx_cache=False semantics; in-step ctx/pair draws)")
    p.add_argument("--refresh", action="store_true",
                   help="trace the per-epoch whole-graph ctx+pair cache "
                   "refresh instead of the train step (one 'step' = one "
                   "full refresh)")
    p.add_argument("--trace-dir", default="/tmp/pmgt_trace")
    p.add_argument("--out", default=None)
    p.add_argument("--parse-only", action="store_true",
                   help="parse an existing trace dir")
    args = p.parse_args()

    if not args.parse_only:
        if sum((args.exact, args.fwd_bwd_only, args.refresh)) > 1:
            raise SystemExit(
                "--exact, --fwd-bwd-only and --refresh are exclusive"
            )
        task = build_task(args.batch, args.num_nodes, args.avg_degree)
        if args.refresh:
            run_traced_refresh(task, args.steps, args.trace_dir)
        else:
            run_traced(
                task, args.batch, args.steps, args.trace_dir,
                fwd_bwd_only=args.fwd_bwd_only, exact=args.exact,
            )
    result = parse_xplane(args.trace_dir, args.steps)
    text = json.dumps(result, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
