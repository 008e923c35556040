"""Production-scale smoke: sustained PMGT pretraining at N >> TG scale.

The headline bench runs the paper's TG-scale graph (10,834 nodes). This
smoke proves the on-device pipeline — alias-table build, per-epoch
context/pair cache refresh, whole-epoch `lax.scan`, eval — works and
stays fast at production node counts on ONE chip (feature tables are
row-shardable across a mesh for bigger-still graphs, core/mesh.py).

Timing per CLAUDE.md's measurement rule: whole epochs, scan-and-fetch,
median over epochs.

Sharded-table mode (VERDICT r3 #5): ``--shard-feat-tables`` row-shards
the frozen feature tables over the mesh (pair with ``--cpu-mesh 8`` for
the virtual 8-device CPU mesh when only one chip is available); prints
the per-device footprint and asserts it is total/mesh_size. The
dedicated 100k-node footprint+parity test is
tests/test_scale_sharded.py; this flag exists so a real v5e-8 run can
measure sharded *throughput* when hardware is available.

Usage: python tools/scale_smoke.py [--num-nodes 100000] [--epochs 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-nodes", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--avg-degree", type=int, default=16)
    ap.add_argument("--shard-feat-tables", action="store_true",
                    help="row-shard the frozen feature tables over the "
                    "mesh (gather_rows dataflow)")
    ap.add_argument("--feat-tables-dtype", default=None,
                    choices=("float32", "bfloat16", "int8"),
                    help="table storage dtype (int8 = per-row quantized, "
                    "half of bf16's HBM — the single-chip capacity lever "
                    "for node counts whose bf16 tables no longer fit)")
    ap.add_argument("--cpu-mesh", type=int, default=None, metavar="N",
                    help="run on a virtual N-device CPU mesh instead of "
                    "the default backend (sharding without N real chips)")
    args = ap.parse_args()

    if args.cpu_mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
            ).strip()

    import jax

    if args.cpu_mesh:
        # The axon sitecustomize pins jax_platforms at interpreter start;
        # env JAX_PLATFORMS is ignored — update the config post-import.
        jax.config.update("jax_platforms", "cpu")

    from pmgt_tpu.core.config import TrainArgs
    from pmgt_tpu.data.synthetic import make_synthetic_dataset
    from pmgt_tpu.tasks.pmgt_task import PMGTTask

    t0 = time.time()
    art = make_synthetic_dataset(
        num_nodes=args.num_nodes,
        num_users=100,
        feat_dims=(1536, 768),
        interactions_per_user=2,
        avg_degree=args.avg_degree,
        seed=0,
    )
    print(f"synthetic dataset ({args.num_nodes} nodes): "
          f"{time.time()-t0:.0f}s", flush=True)

    extra = dict(hidden_size=128, intermediate_size=128,
                 num_hidden_layers=5, num_attention_heads=1)
    if args.shard_feat_tables:
        extra.update(shard_feat_tables=True, fusion_strategy="gather_rows")
    if args.feat_tables_dtype:
        extra.update(feat_tables_dtype=args.feat_tables_dtype)
    targs = TrainArgs(
        model_name="PMGT", dataset_name="scale-smoke", seed=0,
        num_epochs=1, train_batch_size=args.batch,
        test_batch_size=args.batch, lr=1e-4, mp_enabled=True,
        gradient_max_norm=5.0, num_devices=args.cpu_mesh,
        extra=extra,
    )
    nodes = np.arange(2, art.num_nodes + 2, dtype=np.int32)
    t0 = time.time()
    task = PMGTTask(targs, art, nodes, nodes[: args.batch])
    print(f"task build (tables to device, alias pack): "
          f"{time.time()-t0:.0f}s", flush=True)

    leaves = jax.tree.leaves(task.feat_tables)
    total = sum(l.nbytes for l in leaves)
    per_dev = sum(l.addressable_shards[0].data.nbytes for l in leaves)
    print(f"feat tables: {total/2**20:.0f} MB total, "
          f"{per_dev/2**20:.0f} MB on device 0 "
          f"({'sharded' if args.shard_feat_tables else 'replicated'}, "
          f"mesh size {task.mesh.size})", flush=True)
    if args.shard_feat_tables:
        assert per_dev * task.mesh.size == total, (per_dev, total)

    def run_epoch(epoch):
        t0 = time.time()
        task.on_epoch_start(epoch)
        t1 = time.time()
        state, losses = task.train_epoch(task.state, epoch)
        # Real d2h fetch: the tunnel's block_until_ready can return
        # without executing (demand-driven dispatch); fetching an output
        # forces the whole program.
        losses = np.asarray(jax.device_get(losses))
        t2 = time.time()
        task.state = state
        return len(losses), float(losses[-1]), t1 - t0, t2 - t1

    t0 = time.time()
    n, loss, refresh_s, scan_s = run_epoch(0)
    print(f"epoch 0 (compile+warm): {time.time()-t0:.0f}s "
          f"({n} steps, loss {loss:.4f})", flush=True)

    rates, stats = [], []
    for e in range(1, args.epochs + 1):
        n, loss, refresh_s, scan_s = run_epoch(e)
        rate = args.batch * n / (refresh_s + scan_s)
        rates.append(rate)
        stats.append((refresh_s, scan_s))
        print(
            f"epoch {e}: {n} steps, loss {loss:.4f}, refresh "
            f"{refresh_s*1e3:.0f} ms, scan {scan_s*1e3/n:.2f} ms/step, "
            f"{rate:,.0f} nodes/sec", flush=True,
        )
    mid = len(rates) // 2
    r = sorted(rates)[mid]
    print(f"median sustained: {r:,.0f} nodes/sec/chip at "
          f"{args.num_nodes} nodes")

    m = task.evaluate(task.state, "valid")
    print(f"eval: {m}")


if __name__ == "__main__":
    main()
