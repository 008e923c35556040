"""Microbenchmark: one PMGT encoder layer fwd+bwd, fused-kernel vs the
per-op (XLA + Pallas-attention) layer, at the training hot-path shape
[B*(1+P+1), S, H] = [6144, 6, 128].

Usage (TPU):
    python tools/bench_fused_layer.py                 # both impls
    PMGT_FUSED_BLOCK_BWD=128 python tools/bench_fused_layer.py --impl fused
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pmgt_tpu.core.config import PMGTConfig
from pmgt_tpu.models.pmgt import FusedPMGTLayer, PMGTLayer

B, S, H, I = 6144, 6, 128, 128
STEPS = 30


def bench_layer(layer_cls, cfg, tag):
    layer = layer_cls(cfg)
    x = jnp.asarray(np.random.RandomState(0).normal(size=(B, S, H)), jnp.float32)
    mask = jnp.zeros((B, 1, 1, S), jnp.float32)
    params = layer.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, mask, True,
    )["params"]

    def loss(p, x):
        out = layer.apply(
            {"params": p}, x, mask, False, rngs={"dropout": jax.random.key(2)}
        )
        return jnp.sum(out * out)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    fwd_fn = jax.jit(loss)

    # warmup/compile
    jax.block_until_ready(grad_fn(params, x))
    jax.block_until_ready(fwd_fn(params, x))

    t0 = time.time()
    for _ in range(STEPS):
        out = fwd_fn(params, x)
    jax.block_until_ready(out)
    fwd_ms = (time.time() - t0) / STEPS * 1e3

    t0 = time.time()
    for _ in range(STEPS):
        out = grad_fn(params, x)
    jax.block_until_ready(out)
    fb_ms = (time.time() - t0) / STEPS * 1e3

    print(
        f"{tag}: fwd {fwd_ms:.3f} ms, fwd+bwd {fb_ms:.3f} ms "
        f"(bwd ~{fb_ms - fwd_ms:.3f} ms)",
        flush=True,
    )
    return fwd_ms, fb_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=["both", "fused", "xla", "pallas"],
                    default="both")
    args = ap.parse_args()

    results = {}
    if args.impl in ("both", "xla"):
        cfg = PMGTConfig(hidden_size=H, intermediate_size=I,
                         num_hidden_layers=1, attention_impl="xla")
        results["xla"] = bench_layer(PMGTLayer, cfg, "per-op (XLA attention)")
    if args.impl in ("both", "pallas"):
        cfg = PMGTConfig(hidden_size=H, intermediate_size=I,
                         num_hidden_layers=1, attention_impl="pallas")
        results["pallas"] = bench_layer(
            PMGTLayer, cfg, "per-op (Pallas attention)"
        )
    if args.impl in ("both", "fused"):
        from pmgt_tpu.ops import fused_layer as fl

        cfg = PMGTConfig(hidden_size=H, intermediate_size=I,
                         num_hidden_layers=1, attention_impl="fused_layer")
        results["fused"] = bench_layer(
            FusedPMGTLayer, cfg,
            f"fused layer (blocks fwd={fl.BLOCK_FWD} bwd={fl.BLOCK_BWD})",
        )


if __name__ == "__main__":
    main()
