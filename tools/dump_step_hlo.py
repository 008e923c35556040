"""Dump the TPU-optimized HLO of the train step and summarize its
largest relayout copies — the step-level companion of
dump_refresh_hlo.py.

Round-4 finding recorded in ROADMAP.md: in the exact-mode step the
biggest copy (s32[5120,128,61] at TG scale, mcn.py gather) rewrites the
gathered draw-row buffer to layout {1,0,2} so the 128-wide wavefront
axis sits on the hardware lanes; the gather can only write
rows-contiguous, where every one-hot sweep pads 61->128 lanes. The copy
is load-bearing (the where-chain variant that avoids it measured
+6.2 ms/step), and runs at ~53% transpose efficiency.

Usage: python tools/dump_step_hlo.py [--exact] [--batch 512]
       [--num-nodes 10834] [--out FILE] [--top 12]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--num-nodes", type=int, default=10834)
    ap.add_argument("--avg-degree", type=int, default=16)
    ap.add_argument("--exact", action="store_true",
                    help="exact per-occurrence sampling step (ctx_cache=0)")
    ap.add_argument("--out", default=None, help="write full HLO text here")
    ap.add_argument("--top", type=int, default=12,
                    help="how many copies to print, largest first")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ab_step import build_task, build_runner
    from pmgt_tpu.data.synthetic import make_synthetic_dataset

    art = make_synthetic_dataset(
        num_nodes=args.num_nodes, num_users=100, feat_dims=(1536, 768),
        interactions_per_user=2, avg_degree=args.avg_degree, seed=0,
    )
    extra = {"ctx_cache": 0} if args.exact else {}
    task = build_task(art, args.batch, extra)
    ctx = task._get_ctx(("train", 0))
    targets = jnp.arange(2, 2 + args.batch, dtype=jnp.int32)
    key = jax.random.key(9)
    fn = build_runner(task, 4)
    compiled = fn.lower(
        task.state, task.graph, task.feat_tables, ctx, targets, key
    ).compile()
    text = compiled.as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {len(text)} chars to {args.out}")

    copies = []
    for line in text.splitlines():
        s = line.strip()
        m = re.match(r"%?(copy[-.\w]*) = ([a-z0-9]+)\[([0-9,]*)\]", s)
        if m:
            _, dt, dims = m.groups()
            n = 1
            for d in dims.split(",") if dims else []:
                n *= int(d)
            copies.append((n, dt, dims, s[:220]))
    copies.sort(reverse=True)
    for n, dt, dims, s in copies[: args.top]:
        print(f"{n:>12} {dt}[{dims}]  {s}")


if __name__ == "__main__":
    main()
