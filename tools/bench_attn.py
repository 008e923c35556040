"""Micro-bench of the seq-major Pallas dual-attention op on TPU.

Times fwd+bwd of the attention op alone at TG step scale
(N = 6144 fused sequences x 1 head, d = 128, 5 layers' worth per
iteration) with the honest scan-and-fetch harness (CLAUDE.md
measurement rule): ONE jitted lax.scan, per-iteration folded key, real
data dependencies (the key perturbs q, layers chain), scalar fetch.

Round 3 note: a residual-stashing backward variant (p1/p2/cos stashed
fwd->bwd to skip the recompute) was A/B'd here and at full-step level
(tools/ab_step.py) and measured a wash at op level / +0.3 ms/step worse
at step level — the recompute backward is bandwidth-bound. The variant
was removed; this harness remains for future kernel A/Bs.

Usage: python tools/bench_attn.py [--n 6144] [--steps 50] [--layers 5]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pmgt_tpu.ops.dual_attention import dual_attention_pallas_sm


def build(n, d, layers, dropout):
    def one(q, k, v, c, mask, key):
        def loss(q, k, v, c):
            acc = jnp.float32(0.0)
            x = q
            for i in range(layers):
                out = dual_attention_pallas_sm(
                    x, k, v, c, mask, 0.5, dropout,
                    dropout == 0.0, jax.random.fold_in(key, i),
                )
                x = out.astype(x.dtype)  # chain layers: real data deps
                acc = acc + jnp.sum(out.astype(jnp.float32))
            return acc

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            q, k, v, c
        )
        return val + sum(jnp.sum(g.astype(jnp.float32)) for g in grads)

    @functools.partial(jax.jit, static_argnums=(6,))
    def scan_steps(q, k, v, c, mask, key, steps):
        def body(carry, i):
            k_i = jax.random.fold_in(key, i)
            # perturb q so iterations aren't identical (hoist guard)
            qi = q + jax.random.uniform(k_i, (), dtype=q.dtype) * 1e-6
            return carry + one(qi, k, v, c, mask, k_i), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(steps))
        return acc

    return scan_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6144)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--layers", type=int, default=5)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--blocks", default="256:128",
                    help="comma list of fwd:bwd block-size variants to "
                    "sweep interleaved, e.g. 256:128,512:256,1024:512")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import pmgt_tpu.ops.dual_attention as attn_mod

    s = 6
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q, k, v, c = (
        jnp.asarray(rng.normal(size=(s, args.n, args.d)), dt)
        for _ in range(4)
    )
    mask = jnp.zeros((args.n, s), dt)
    key = jax.random.key(0)

    variants = []
    for spec in args.blocks.split(","):
        fwd_b, bwd_b = (int(x) for x in spec.split(":"))
        # Module globals are read at trace time, so set-then-jit builds
        # each variant with its own blocks (one process, interleavable).
        attn_mod.BLOCK_N_SM = fwd_b
        attn_mod.BLOCK_N_SM_BWD = bwd_b
        fn = build(args.n, args.d, args.layers, args.dropout)
        t0 = time.time()
        try:
            float(fn(q, k, v, c, mask, key, args.steps))  # compile + warm
        except Exception as e:  # scoped-VMEM OOM etc: skip this variant
            msg = str(e).splitlines()[0][:160]
            print(f"{spec}: SKIPPED ({msg})", flush=True)
            continue
        print(f"{spec}: compiled+warm in {time.time()-t0:.0f}s", flush=True)
        variants.append((spec, fn))

    samples = {spec: [] for spec, _ in variants}
    r = 0
    for rep in range(args.reps):
        for spec, fn in variants:
            r += 1
            t0 = time.perf_counter()
            float(fn(q, k, v, c, mask, jax.random.fold_in(key, r),
                     args.steps))
            dt_ms = (time.perf_counter() - t0) * 1e3 / args.steps
            samples[spec].append(dt_ms / args.layers)
            print(f"rep={rep} blocks={spec}: {dt_ms:.3f} ms/iter "
                  f"({dt_ms / args.layers:.3f} ms/layer)", flush=True)
    for spec, _ in variants:
        sm = samples[spec]
        print(f"blocks={spec}: median {np.median(sm):.3f} "
              f"min {min(sm):.3f} ms/layer")


if __name__ == "__main__":
    main()
