"""Single-chip node-count capacity probe: bf16 vs int8 feature tables.

The frozen multimodal tables are the dominant HBM tenant at production
node counts (bf16: 4.3 MB per 1k nodes at 1536+768 feats). int8
row-quantized storage (core/quant.py) halves that; this probe runs the
FULL sustained-training smoke (refresh + epoch scan + eval) at a node
count chosen so the bf16 tables no longer fit on one v5e chip (16 GB),
recording for each dtype either the sustained rate or the exact OOM.

The synthetic dataset is generated ONCE and reused across variants
(host gen at multi-million nodes is minutes on one CPU); device buffers
of a finished/failed variant are dropped before the next builds.

Usage: python tools/capacity_probe.py [--num-nodes 2500000]
       [--dtypes bfloat16,int8] [--epochs 2]
"""
import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_variant(art, dtype, batch, epochs):
    import jax

    from pmgt_tpu.core.config import TrainArgs
    from pmgt_tpu.tasks.pmgt_task import PMGTTask

    res = {"dtype": dtype}
    try:
        targs = TrainArgs(
            model_name="PMGT", dataset_name="capacity", seed=0,
            num_epochs=1, train_batch_size=batch, test_batch_size=batch,
            lr=1e-4, mp_enabled=True, gradient_max_norm=5.0,
            extra=dict(
                hidden_size=128, intermediate_size=128,
                num_hidden_layers=5, num_attention_heads=1,
                feat_tables_dtype=dtype,
            ),
        )
        nodes = np.arange(2, art.num_nodes + 2, dtype=np.int32)
        t0 = time.time()
        task = PMGTTask(targs, art, nodes, nodes[:batch])
        leaves = jax.tree.leaves(task.feat_tables)
        res["table_gb"] = round(sum(l.nbytes for l in leaves) / 2**30, 2)
        graph_gb = sum(
            l.nbytes for l in jax.tree.leaves(task.graph)
        ) / 2**30
        res["graph_gb"] = round(graph_gb, 2)
        print(f"[{dtype}] task built in {time.time()-t0:.0f}s: tables "
              f"{res['table_gb']} GB, graph {res['graph_gb']} GB",
              flush=True)

        def epoch(e):
            t0 = time.time()
            task.on_epoch_start(e)
            t1 = time.time()
            state, losses = task.train_epoch(task.state, e)
            losses = np.asarray(jax.device_get(losses))
            t2 = time.time()
            task.state = state
            return len(losses), float(losses[-1]), t1 - t0, t2 - t1

        t0 = time.time()
        n, loss, *_ = epoch(0)
        res["compile_s"] = round(time.time() - t0)
        print(f"[{dtype}] epoch 0 (compile+warm) {res['compile_s']}s, "
              f"{n} steps, loss {loss:.4f}", flush=True)
        rates = []
        for e in range(1, epochs + 1):
            n, loss, refresh_s, scan_s = epoch(e)
            rate = task.args.train_batch_size * n / (refresh_s + scan_s)
            rates.append(rate)
            print(f"[{dtype}] epoch {e}: {n} steps, loss {loss:.4f}, "
                  f"refresh {refresh_s*1e3:.0f} ms, "
                  f"scan {scan_s*1e3/n:.2f} ms/step, {rate:,.0f} nodes/sec",
                  flush=True)
        res["nodes_per_sec"] = round(sorted(rates)[len(rates) // 2])
        res["final_loss"] = loss
        res["ok"] = True
    except Exception as exc:  # noqa: BLE001 — OOM classes vary by backend
        msg = str(exc)
        res["ok"] = False
        res["error_type"] = type(exc).__name__
        res["oom"] = (
            "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
            or "out of memory" in msg or "exceeds the" in msg
        )
        res["error"] = msg[:500]
        print(f"[{dtype}] FAILED ({res['error_type']}, oom={res['oom']}): "
              f"{msg[:300]}", flush=True)
    finally:
        try:
            del task
        except UnboundLocalError:
            pass
        gc.collect()
        try:
            import jax as _j
            _j.clear_caches()
        except Exception:  # noqa: BLE001
            pass
    return res


def _load_or_make(num_nodes, avg_degree, cache_dir):
    from pmgt_tpu.data.artifacts import DatasetArtifacts
    from pmgt_tpu.data.synthetic import make_synthetic_dataset
    from pmgt_tpu.graph.container import PaddedGraph

    path = (
        os.path.join(cache_dir, f"synth_{num_nodes}_{avg_degree}.npz")
        if cache_dir else None
    )
    if path and os.path.exists(path):
        z = np.load(path)
        return DatasetArtifacts(
            graph=PaddedGraph(
                *(z[f"g_{f}"] for f in PaddedGraph._fields)
            ),
            feat_init_embs=[z["feat_0"], z["feat_1"]],
            train_pairs=z["train_pairs"],
            test_pairs=z["test_pairs"],
            num_users=int(z["num_users"]),
            num_items=int(z["num_items"]),
        )
    art = make_synthetic_dataset(
        num_nodes=num_nodes, num_users=100, feat_dims=(1536, 768),
        interactions_per_user=2, avg_degree=avg_degree, seed=0,
    )
    if path:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(
            path,
            **{f"g_{f}": np.asarray(a)
               for f, a in zip(PaddedGraph._fields, art.graph)},
            feat_0=art.feat_init_embs[0], feat_1=art.feat_init_embs[1],
            train_pairs=art.train_pairs, test_pairs=art.test_pairs,
            num_users=art.num_users, num_items=art.num_items,
        )
        print(f"cached dataset at {path}", flush=True)
    return art


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-nodes", type=int, default=2_500_000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--avg-degree", type=int, default=16)
    ap.add_argument("--dtypes", default="bfloat16,int8")
    ap.add_argument("--out", default=None, help="write results JSON here")
    ap.add_argument("--cache-dir", default=None,
                    help="npz-cache the generated dataset here (multi-"
                    "million-node generation is tens of minutes on one "
                    "CPU; the npz round-trip is tens of seconds)")
    args = ap.parse_args()

    t0 = time.time()
    art = _load_or_make(args.num_nodes, args.avg_degree, args.cache_dir)
    gen_s = round(time.time() - t0)
    print(f"synthetic dataset ({args.num_nodes} nodes): {gen_s}s", flush=True)

    results = {
        "num_nodes": args.num_nodes,
        "batch": args.batch,
        "gen_s": gen_s,
        "variants": [
            run_variant(art, d, args.batch, args.epochs)
            for d in args.dtypes.split(",")
        ],
    }
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
