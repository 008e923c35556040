"""Measure the ROADMAP "step tail" idea: run the FFN/LN segment of each
encoder layer on [B*S, H] instead of [B, S, H].

The training step's XLA profile shows a flat tail of ~0.1 ms elementwise
fusions on [6144, 6, 128] tensors: the 6-token sequence dim maps to the
8-row sublane tile, wasting 25% of every elementwise op. [B, S, H] →
[B*S, H] is a layout-preserving (bitcast) reshape in row major, and
[36864, 128] tiles perfectly — if XLA treats the reshapes as free, the
packed variant recovers the waste on every LN/GELU/dropout/residual op.

Run on the TPU (no args); prints fwd+bwd ms per variant.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, S, H = 6144, 6, 128
LAYERS = 5
DTYPE = jnp.bfloat16


def make_params(key):
    keys = jax.random.split(key, LAYERS * 4)
    params = []
    for i in range(LAYERS):
        k = keys[i * 4 : (i + 1) * 4]
        params.append(
            dict(
                wo=jax.random.normal(k[0], (H, H), DTYPE) * 0.02,
                wi=jax.random.normal(k[1], (H, H), DTYPE) * 0.02,
                wf=jax.random.normal(k[2], (H, H), DTYPE) * 0.02,
                qk=jax.random.normal(k[3], (H, H), DTYPE) * 0.02,
            )
        )
    return params


def ln(x):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-12)).astype(x.dtype)


def attention(x, p):
    # Stand-in for the dual-attention core: needs [B, S, H].
    q = x @ p["qk"]
    probs = jax.nn.softmax(
        jnp.einsum("bsh,bth->bst", q, x).astype(jnp.float32), axis=-1
    ).astype(x.dtype)
    return jnp.einsum("bst,bth->bsh", probs, x)


def ffn_segment(x, p):
    # attention_output dense + LN + FFN + LN (gelu exact-erf analogue).
    h = ln(x @ p["wo"] + x)
    inter = jax.nn.gelu(h @ p["wi"], approximate=False)
    return ln(inter @ p["wf"] + h)


def encoder_unpacked(params, x):
    for p in params:
        a = attention(x, p)
        x = ffn_segment(a, p)
    return (x.astype(jnp.float32) ** 2).mean()


def encoder_packed(params, x):
    flat = x.reshape(B * S, H)
    for p in params:
        a = attention(flat.reshape(B, S, H), p).reshape(B * S, H)
        flat = ffn_segment(a, p)
    return (flat.astype(jnp.float32) ** 2).mean()


def bench(fn, params, xs):
    """One scanned loop over distinct inputs, reduced to a scalar that is
    actually fetched. The tunnel defers/elides device work whose results
    are never read (measured: 4x more work ran "faster" with per-call
    host timing) and memoizes repeated identical executions, so the only
    honest timing is a single fresh call whose scalar output forces the
    whole chain, divided by n. ``params`` is threaded as a jit argument
    (a closure would bake the weights in as constants)."""
    import jax.flatten_util

    @jax.jit
    def run(params, stacked, shift):
        def body(acc, x):
            g = jax.grad(fn)(params, x + shift)
            flat, _ = jax.flatten_util.ravel_pytree(g)
            return acc + jnp.sum(flat.astype(jnp.float32) ** 2), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return acc

    stacked = jnp.stack(xs)
    float(run(params, stacked, jnp.bfloat16(0.0)))  # compile + warm
    t0 = time.time()
    # distinct from the warm call: identical executions get memoized
    float(run(params, stacked, jnp.bfloat16(1e-3)))
    return (time.time() - t0) / len(xs) * 1e3


def main():
    key = jax.random.key(0)
    params = make_params(key)
    xs = [
        jax.random.normal(jax.random.key(1 + i), (B, S, H), DTYPE)
        for i in range(50)
    ]
    times = {}
    for name, fn in (
        ("unpacked [B,S,H]", encoder_unpacked),
        ("packed   [B*S,H]", encoder_packed),
    ):
        ts = [bench(fn, params, xs) for _ in range(3)]
        times[name] = float(np.median(ts))
        print(f"{name}: fwd+bwd {times[name]:.3f} ms (runs: {ts})")
    ratio = times["unpacked [B,S,H]"] / times["packed   [B*S,H]"]
    print(f"packed speedup: {ratio:.3f}x")


if __name__ == "__main__":
    main()
