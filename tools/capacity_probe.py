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


def run_variant(art, dtype, batch, epochs, shard=False, num_devices=None,
                max_steps=None, ctx_cache=True):
    import jax

    from pmgt_tpu.core.config import TrainArgs
    from pmgt_tpu.tasks.pmgt_task import PMGTTask

    res = {"dtype": dtype, "shard": bool(shard)}
    try:
        targs = TrainArgs(
            model_name="PMGT", dataset_name="capacity", seed=0,
            num_epochs=1, train_batch_size=batch, test_batch_size=batch,
            lr=1e-4, mp_enabled=True, gradient_max_norm=5.0,
            num_devices=num_devices,
            extra=dict(
                hidden_size=128, intermediate_size=128,
                num_hidden_layers=5, num_attention_heads=1,
                feat_tables_dtype=dtype,
                shard_feat_tables=shard,
                shard_graph_tables=shard,
                ctx_cache=ctx_cache,
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
        # Per-device PERSISTENT footprint — the number a 16 GB chip must
        # hold between steps. With --shard, the per-node tables (features
        # + graph) split ~1/mesh over the data axis.
        res["per_device_gb"] = round(
            sum(
                l.addressable_shards[0].data.nbytes
                for l in jax.tree.leaves((task.feat_tables, task.graph))
            ) / 2**30,
            3,
        )
        print(f"[{dtype}] task built in {time.time()-t0:.0f}s: tables "
              f"{res['table_gb']} GB, graph {res['graph_gb']} GB, "
              f"per-device persistent {res['per_device_gb']} GB",
              flush=True)

        if max_steps is not None:
            # Bounded fit probe (virtual CPU meshes: full multi-million-
            # node epochs are hours of host compute; placement + refresh
            # + real optimizer steps are the fit evidence).
            t0 = time.time()
            task.on_epoch_start(0)
            res["refresh_s"] = round(time.time() - t0, 1)
            # Cap at the epoch's actual batch count: a fitting config
            # with fewer batches than --max-steps must record ok=true,
            # not fall into the failure handler via StopIteration.
            it = iter(task.train_batches(0))
            losses = []
            t0 = time.time()
            for _ in range(max_steps):
                try:
                    batch = next(it)
                except StopIteration:
                    break
                task.state, metrics = task.train_step(task.state, batch)
                losses.append(float(jax.device_get(metrics["loss"])))
            res["steps"] = len(losses)
            res["step_s"] = round((time.time() - t0) / max(len(losses), 1), 2)
            res["losses"] = [round(l, 4) for l in losses]
            res["ok"] = bool(np.all(np.isfinite(losses)))
            print(f"[{dtype}] refresh {res['refresh_s']}s + {max_steps} "
                  f"steps at {res['step_s']}s/step, losses {res['losses']}",
                  flush=True)
            return res

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
    ap.add_argument("--shard", action="store_true",
                    help="row-shard feature AND graph tables over the "
                    "device mesh (--shard-feat-tables + "
                    "--shard-graph-tables)")
    ap.add_argument("--num-devices", type=int, default=None)
    ap.add_argument("--virtual-cpu-mesh", type=int, default=None,
                    metavar="N",
                    help="probe on an N-device virtual CPU mesh instead "
                    "of the real chip (multi-chip fit evidence without "
                    "multi-chip hardware; implies --num-devices N)")
    ap.add_argument("--max-steps", type=int, default=None,
                    help="bounded probe: refresh + this many optimizer "
                    "steps instead of full epochs (use on CPU meshes)")
    ap.add_argument("--no-ctx-cache", action="store_true",
                    help="exact per-occurrence sampling: skip the "
                    "whole-graph refresh. REQUIRED for multi-million-"
                    "node probes on a virtual CPU mesh — the N virtual "
                    "devices replicate the refresh transient N times in "
                    "ONE host address space (observed: host OOM at "
                    "129 GB RSS for 2.5M nodes x 8 devices), a proof-"
                    "environment artifact real per-chip HBM doesn't "
                    "have; the refresh transient on hardware is bounded "
                    "by effective_refresh_chunk's per-device accounting")
    args = ap.parse_args()

    if args.virtual_cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_cpu_mesh}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.num_devices = args.virtual_cpu_mesh

    t0 = time.time()
    art = _load_or_make(args.num_nodes, args.avg_degree, args.cache_dir)
    gen_s = round(time.time() - t0)
    print(f"synthetic dataset ({args.num_nodes} nodes): {gen_s}s", flush=True)

    results = {
        "num_nodes": args.num_nodes,
        "batch": args.batch,
        "gen_s": gen_s,
        "shard": args.shard,
        "num_devices": args.num_devices,
        "variants": [
            run_variant(art, d, args.batch, args.epochs, shard=args.shard,
                        num_devices=args.num_devices,
                        max_steps=args.max_steps,
                        ctx_cache=not args.no_ctx_cache)
            for d in args.dtypes.split(",")
        ],
    }
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
