"""Bytes-per-step roofline for the cached PMGT train step (VERDICT r3 #2).

The FLOP argument for "the 8.9 ms device step is bandwidth-bound" exists
(127 GFLOP/step ~ 0.65 ms at the v5e's 197 bf16 TFLOP/s vs 2.3 ms of
measured matmul time, ROADMAP.md); this tool supplies the missing BYTES
side: XLA's post-fusion cost model (`compiled.cost_analysis()`, which
sums operand+output bytes over the optimized HLO — i.e. HBM traffic
assuming each fusion reads inputs and writes outputs once) for the exact
programs the bench runs, set against the v5e-1 HBM bandwidth, next to an
analytic breakdown of where the bytes live.

v5e single-chip peaks (public spec): 819 GB/s HBM, 197 bf16 TFLOP/s.

Usage: python tools/roofline.py [--batch 512] [--exact]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0  # v5e HBM bandwidth
BF16_TFLOPS = 197.0  # v5e bf16 peak


def fmt_ms(b):
    return b / (HBM_GBPS * 1e9) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--num-nodes", type=int, default=10834)
    ap.add_argument("--avg-degree", type=int, default=16)
    ap.add_argument("--exact", action="store_true",
                    help="analyze the exact per-occurrence sampling step "
                    "(ctx_cache=0) instead of the cached step")
    args = ap.parse_args()

    from tools.ab_step import build_task

    from pmgt_tpu.data.synthetic import make_synthetic_dataset

    art = make_synthetic_dataset(
        num_nodes=args.num_nodes, num_users=100, feat_dims=(1536, 768),
        interactions_per_user=2, avg_degree=args.avg_degree, seed=0,
    )
    overrides = dict(ctx_cache=0) if args.exact else {}
    task = build_task(art, args.batch, overrides)
    ctx = task._get_ctx(("train", 0))
    targets = jnp.arange(2, 2 + args.batch, dtype=jnp.int32)
    key = jax.random.key(0)

    reports = {}

    def analyze(name, jitted, *fn_args):
        lowered = jitted.lower(*fn_args)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0]
        reports[name] = ca
        by = ca.get("bytes accessed", float("nan"))
        fl = ca.get("flops", float("nan"))
        print(f"\n== {name} ==")
        print(f"  bytes accessed (post-fusion HLO): {by/2**30:.3f} GiB")
        print(f"  -> HBM roofline at {HBM_GBPS:.0f} GB/s: "
              f"{fmt_ms(by):.2f} ms")
        print(f"  flops: {fl/1e9:.1f} GFLOP -> MXU roofline at "
              f"{BF16_TFLOPS:.0f} bf16 TFLOP/s: "
              f"{fl/(BF16_TFLOPS*1e12)*1e3:.2f} ms")
        # Operand-class split when present (output vs operand bytes).
        extras = {k: v for k, v in ca.items()
                  if k.startswith("bytes accessed") and k != "bytes accessed"}
        for k in sorted(extras):
            print(f"  {k}: {extras[k]/2**30:.3f} GiB")
        return ca

    analyze(
        "train step" + (" (exact)" if args.exact else " (cached)"),
        task._train_step_fn,
        task.state, task.graph, task.feat_tables, targets, key, ctx,
    )
    if not args.exact:
        seed = np.uint32(7)
        analyze(
            "ctx refresh (sample_all_contexts)",
            task._sample_all_fn,
            task.graph, task._all_nodes, seed,
        )
        analyze(
            "pair refresh (sample_all_pairs)",
            task._sample_pairs_train_fn,
            task.graph, seed,
        )

    # ---- analytic breakdown (cached step; hand model for the ROADMAP) --
    if not args.exact:
        B = args.batch
        S = task.sampling.seq_len
        P = task.sampling.max_total_samples
        H = task.config.hidden_size
        L = task.config.num_hidden_layers
        n_seq = B * (1 + P + 1)  # target + P pairs + NFR pass
        tokens = n_seq * S
        bpe = 2  # bf16 compute
        n_nodes = task.graph.nbr_ids.shape[0]
        fdims = task.config.feat_hidden_sizes
        t_bytes = sum(n_nodes * d * 2 for d in fdims)  # bf16 tables
        act = tokens * H * bpe  # one traversal of the residual stream
        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(task.state.params)
        )
        print("\n== analytic breakdown (cached step) ==")
        print(f"  fused sequences {n_seq} x {S} tokens, hidden {H}, "
              f"{L} layers; one [tokens, H] bf16 traversal = "
              f"{act/2**20:.1f} MiB ({fmt_ms(act):.3f} ms)")
        print(f"  frozen tables (bf16): {t_bytes/2**20:.0f} MiB; "
              f"project-tables fusion reads them ~2x/step (fwd + dW) = "
              f"{fmt_ms(2*t_bytes):.2f} ms")
        print(f"  params {n_params/1e6:.2f}M; AdamW reads p+m+v and "
              f"writes p+m+v (f32): {fmt_ms(n_params*4*6):.3f} ms")

    tot = reports.get("train step (cached)") or reports.get(
        "train step (exact)"
    )
    print("\nSet `bytes accessed` against the measured device step "
          "(xplane, tools/trace_step.py) to get %-of-roofline.")


if __name__ == "__main__":
    main()
