#!/usr/bin/env python
"""PMGT pretraining throughput benchmark.

Measures end-to-end training throughput (on-device MCN sampling + fused
GSR/NFR train step + AdamW update) at the paper's model configuration
(hidden 128, 5 layers, 1 head, hops [16,8,4], 10 pairs/target) on a
TG-scale synthetic graph (~10.8k nodes, 1536/768-d frozen features).

Prints ONE JSON line:
    {"metric": "pmgt_pretrain_nodes_per_sec_per_chip", "value": N,
     "unit": "nodes/sec/chip", "vs_baseline": R}

``vs_baseline`` compares against a reference-equivalent PyTorch pipeline
(host-side Python sampling + per-sample encoder loop, see
pmgt_tpu/bench/torch_reference.py) measured once on this machine and
cached in .bench_baseline.json. The reference publishes no throughput
numbers (BASELINE.md), so a locally measured baseline is the only honest
comparison available.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")

# TG-scale benchmark workload (BASELINE.md: TG graph = 10,834 nodes).
NUM_NODES = 10834
FEAT_DIMS = (1536, 768)
AVG_DEGREE = 16
BATCH_SIZE = 512
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def build_workload(seed: int = 0):
    from pmgt_tpu.data.synthetic import make_synthetic_dataset

    return make_synthetic_dataset(
        num_nodes=NUM_NODES,
        num_users=100,
        feat_dims=FEAT_DIMS,
        interactions_per_user=2,
        avg_degree=AVG_DEGREE,
        seed=seed,
    )


def measure_tpu(
    art, batch_size: int, attention_impl=None, ctx_cache: bool = True,
    feat_tables_dtype=None,
) -> dict:
    """Sustained training throughput: full epochs including the per-epoch
    context/pair cache refresh (nothing amortized away). With
    ``ctx_cache=False`` every batch samples fresh contexts in-step — the
    reference's exact per-occurrence semantics."""
    import jax

    from pmgt_tpu.core.config import TrainArgs
    from pmgt_tpu.tasks.pmgt_task import PMGTTask

    args = TrainArgs(
        model_name="PMGT",
        dataset_name="bench",
        seed=0,
        num_epochs=1,
        train_batch_size=batch_size,
        test_batch_size=batch_size,
        lr=1e-4,
        mp_enabled=True,
        gradient_max_norm=5.0,
        extra=dict(
            hidden_size=128,
            intermediate_size=128,
            num_hidden_layers=5,
            num_attention_heads=1,
            ctx_cache=ctx_cache,
            # Only pin the table dtype when explicitly requested; None
            # lets PMGTTask's default apply (bf16 storage under mp).
            **(
                {"feat_tables_dtype": feat_tables_dtype}
                if feat_tables_dtype
                else {}
            ),
            **({"attention_impl": attention_impl} if attention_impl else {}),
        ),
    )
    nodes = np.arange(2, art.num_nodes + 2, dtype=np.int32)
    task = PMGTTask(args, art, nodes, nodes[: batch_size])

    def run_epoch(epoch):
        """Returns (n_steps, metrics, refresh_seconds, scan_seconds).

        refresh_seconds is the host-side dispatch time of the cache
        refresh (both it and the epoch scan are async; blocking between
        them would charge the refresh a full device round trip the real
        pipeline never pays).

        The epoch is forced with a real d2h fetch of the losses, NOT
        ``block_until_ready``: the axon tunnel's execution is
        demand-driven and block_until_ready can return without running
        the program (observed: 5 "blocked" epochs at 0.27 ms/step whose
        work all landed in the next phase's fetches). Fetching an output
        forces the whole program — state and losses come from one jit."""
        t0 = time.time()
        task.on_epoch_start(epoch)
        t1 = time.time()
        state, losses = task.train_epoch(task.state, epoch)
        loss_sum = float(np.asarray(jax.device_get(losses)).sum())
        assert np.isfinite(loss_sum)
        t2 = time.time()
        task.state = state
        return len(losses), {"loss": losses[-1]}, t1 - t0, t2 - t1

    # warmup epoch (includes all compiles)
    t0 = time.time()
    run_epoch(0)
    compile_time = time.time() - t0

    # Per-epoch timing with a median: the benchmark chip may be
    # pool-shared, and the median is robust to contention spikes.
    n_epochs = 5
    rates, refreshes, scans = [], [], []
    for e in range(1, 1 + n_epochs):
        n, metrics, refresh_s, scan_s = run_epoch(e)
        rates.append(batch_size * n / (refresh_s + scan_s))
        refreshes.append(refresh_s)
        scans.append(scan_s)
    order = np.argsort(rates)
    mid = order[len(order) // 2]
    nodes_per_sec_blocking = rates[mid]
    n_steps = n

    # --- pipelined sustained rate (the engine's scan-mode pattern) ---
    # Exactly engine.fit's speculation: dispatch epoch e+1's refresh +
    # scan BEFORE fetching epoch e's losses, so the per-epoch fetch round
    # trip overlaps device compute (lag-1 fetch). NB deferring ALL
    # fetches to the end measures 6-7x WORSE through the axon tunnel —
    # dispatches are lazy until a fetch demands them — so the fetch lag
    # must stay bounded; lag 1 and lag 4 measure the same (11.2-11.5
    # ms/step vs 13.4-14.5 blocking). Honest: state threads sequentially,
    # every epoch's losses are fetched, and a final params reduction is
    # fetched too (the last epoch's backward/update cannot be dropped).
    # NB: no eager jnp ops in this loop — each eager op is its own
    # tunneled program dispatch and serializes the pipeline (measured
    # 60+ ms/step with a per-epoch eager jnp.sum). device_get is a pure
    # d2h fetch, the same thing engine.fit does for its loss logging.
    n_pipe = 6
    state = task.state
    pend = []
    total_loss = 0.0
    t0 = time.time()
    for e in range(1 + n_epochs, 1 + n_epochs + n_pipe):
        task.on_epoch_start(e)
        state, losses = task.train_epoch(state, e)
        pend.append(losses)
        if len(pend) > 1:
            total_loss += float(np.asarray(jax.device_get(pend.pop(0))).sum())
    for p in pend:
        total_loss += float(np.asarray(jax.device_get(p)).sum())
    # force the last epoch's update path (fetch a param leaf)
    leaf = jax.tree.leaves(state.params)[0]
    float(np.asarray(jax.device_get(leaf)).ravel()[0])
    jax.block_until_ready(state)
    pipelined_wall = time.time() - t0
    task.state = state
    nodes_per_sec = batch_size * n_steps * n_pipe / pipelined_wall
    assert np.isfinite(total_loss)

    return {
        "nodes_per_sec": nodes_per_sec,
        "nodes_per_sec_blocking": nodes_per_sec_blocking,
        "nodes_per_sec_all_epochs": [round(r) for r in sorted(rates)],
        "compile_plus_warmup_s": compile_time,
        "n_devices": task.mesh.size,
        "loss": float(jax.device_get(metrics["loss"])),
        # step-time decomposition (median blocking epoch): per-epoch cache
        # refresh (sampling) vs the fwd/bwd/update scan
        "refresh_dispatch_ms_per_epoch": round(refreshes[mid] * 1e3, 2),
        "scan_ms_per_step": round(scans[mid] * 1e3 / max(n_steps, 1), 3),
        "pipelined_ms_per_step": round(
            pipelined_wall * 1e3 / max(n_steps * n_pipe, 1), 3
        ),
        "steps_per_epoch": n_steps,
    }


def measure_sampler_only_baseline(art, n_targets: int = 48) -> float:
    """Host sampling rate of the reference pipeline with NO model at all:
    per target, one context + ~10 pair contexts + rejection negatives
    (reference datasets.py:113-183). Because this work runs in Python on
    the host in the reference regardless of the training GPU, it is a
    GPU-independent CEILING on the reference's end-to-end rate — no GPU
    makes the reference faster than this."""
    from pmgt_tpu.bench.torch_reference import HostGraph, sample_context_host

    graph = HostGraph(
        np.asarray(art.graph.nbr_ids),
        np.asarray(art.graph.nbr_logits),
        np.asarray(art.graph.degrees),
    )
    node_ids = np.arange(2, graph.num_nodes + 2)
    np.random.seed(0)
    targets = np.random.choice(node_ids, size=n_targets, replace=False)
    hops = [16, 8, 4]
    t0 = time.time()
    for t in targets:
        sample_context_host(graph, int(t), hops, 5)
        nbrs, _ = graph.adj[int(t)]
        n_pos = min(5, len(nbrs))
        pos = np.random.choice(nbrs, n_pos, replace=False) if n_pos else []
        n_neg = max(5, 10 - n_pos)
        negs = []
        nbr_set = set(nbrs.tolist())
        while len(negs) < n_neg:
            cand = np.random.randint(graph.num_nodes) + 2
            if cand not in nbr_set:
                negs.append(cand)
        for p in list(pos) + negs:
            sample_context_host(graph, int(p), hops, 5)
    return n_targets / (time.time() - t0)


def _load_baseline_cache():
    """Validated cache read; None on missing/corrupt/old-format files
    (a cache problem must not kill the bench after the TPU measurement)."""
    try:
        with open(BASELINE_CACHE, encoding="utf-8") as f:
            cached = json.load(f)
        if "sampler_only_nodes_per_sec" in cached and "nodes_per_sec" in cached:
            return cached
    except (OSError, ValueError):
        pass
    return None


def measure_baseline(art) -> dict:
    """Reference-equivalent torch pipeline + sampler-only ceiling,
    cached across rounds."""
    cached = _load_baseline_cache()
    if cached is not None:
        return cached
    from pmgt_tpu.bench.torch_reference import run_reference_baseline

    graph3 = (
        np.asarray(art.graph.nbr_ids),
        np.asarray(art.graph.nbr_logits),
        np.asarray(art.graph.degrees),
    )
    nodes_per_sec = run_reference_baseline(
        graph3,
        [np.asarray(t) for t in art.feat_init_embs],
        batch_size=32,
        num_batches=3,
    )
    sampler_only = measure_sampler_only_baseline(art)
    cached = {
        "nodes_per_sec": nodes_per_sec,
        "sampler_only_nodes_per_sec": sampler_only,
        "note": (
            "reference-equivalent torch pipeline on host CPU; "
            "sampler_only is the GPU-independent ceiling (host Python "
            "sampling with no model)"
        ),
    }
    with open(BASELINE_CACHE, "w", encoding="utf-8") as f:
        json.dump(cached, f)
    return cached


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=BATCH_SIZE)
    parser.add_argument("--attention-impl", default=None,
                        help="xla | pallas (default: pallas on TPU, xla elsewhere)")
    parser.add_argument("--skip-baseline", action="store_true")
    parser.add_argument("--skip-exact", action="store_true",
                        help="skip the --no-ctx-cache (exact reference "
                        "semantics) measurement")
    parser.add_argument("--no-ctx-cache", action="store_true",
                        help="measure ONLY exact per-occurrence sampling")
    parser.add_argument("--feat-tables-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="storage dtype of the frozen feature tables "
                        "(default: the task's own default — bfloat16 under "
                        "the bf16 compute policy)")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    art = build_workload()

    import jax

    result = measure_tpu(
        art, args.batch_size, args.attention_impl,
        ctx_cache=not args.no_ctx_cache,
        feat_tables_dtype=args.feat_tables_dtype,
    )
    if args.verbose:
        print("tpu:", result, file=sys.stderr)

    exact_per_chip = None
    if not (args.skip_exact or args.no_ctx_cache):
        try:
            exact = measure_tpu(
                art, args.batch_size, args.attention_impl, ctx_cache=False,
                feat_tables_dtype=args.feat_tables_dtype,
            )
            exact_per_chip = exact["nodes_per_sec"] / exact["n_devices"]
            if args.verbose:
                print("tpu exact-mode:", exact, file=sys.stderr)
        except Exception as e:
            print(f"exact-mode measurement failed: {e}", file=sys.stderr)

    if args.skip_baseline:
        # Skip *measuring*, but still report against a cached baseline —
        # vs_baseline=1.0 would misread as parity rather than "unknown".
        baseline = _load_baseline_cache()
    else:
        try:
            baseline = measure_baseline(art)
            if args.verbose:
                print("baseline:", baseline, file=sys.stderr)
        except Exception as e:  # baseline failure must not kill the bench
            print(f"baseline measurement failed: {e}", file=sys.stderr)
            baseline = None

    per_chip = result["nodes_per_sec"] / result["n_devices"]
    # Elision tripwire: the device step alone is ~9 ms at B=512 (xplane
    # ground truth, ROADMAP), so a per-chip rate past this bound means
    # the tunnel skipped work and the measurement harness needs fixing —
    # not that the code got faster.
    if per_chip / (args.batch_size / BATCH_SIZE) > 200_000:
        print(
            f"WARNING: {per_chip:.0f} nodes/sec/chip exceeds any physically "
            "plausible rate for this workload — suspected tunnel elision; "
            "numbers are NOT trustworthy (see CLAUDE.md measurement rule)",
            file=sys.stderr,
        )
    vs = per_chip / baseline["nodes_per_sec"] if baseline else 1.0
    out = {
        "metric": "pmgt_pretrain_nodes_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "nodes/sec/chip",
        "vs_baseline": round(vs, 2),
        # 1.0 with no baseline means UNKNOWN, not parity — flag it so a
        # failed/skipped torch-baseline measurement can't read as "1x".
        **({} if baseline else {"vs_baseline_unknown": True}),
        # decomposition: per-epoch sampling refresh vs fwd/bwd scan
        "refresh_dispatch_ms_per_epoch": result["refresh_dispatch_ms_per_epoch"],
        "scan_ms_per_step": result["scan_ms_per_step"],
        # wall per step in the pipelined (engine-style) schedule vs the
        # epoch-blocking rate it replaced
        "pipelined_ms_per_step": result["pipelined_ms_per_step"],
        "blocking_nodes_per_sec_per_chip": round(
            result["nodes_per_sec_blocking"] / result["n_devices"], 2
        ),
    }
    if exact_per_chip is not None:
        out["exact_mode_nodes_per_sec_per_chip"] = round(exact_per_chip, 2)
    if baseline:
        # GPU-independent ceiling: the reference's host-side sampling alone
        out["baseline_sampler_only_ceiling"] = round(
            baseline["sampler_only_nodes_per_sec"], 2
        )
        out["vs_sampler_only_ceiling"] = round(
            per_chip / baseline["sampler_only_nodes_per_sec"], 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
