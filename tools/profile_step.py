"""Scratch: decompose cached train-step cost on TPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from pmgt_tpu.core.config import PMGTConfig, SamplingConfig, TrainArgs
from pmgt_tpu.data.synthetic import make_synthetic_dataset
from pmgt_tpu.sampling import mcn
from pmgt_tpu.sampling.pairs import (
    make_pretrain_batch_cached,
    sample_all_contexts,
    sample_pairs,
)
from pmgt_tpu.tasks.pmgt_task import PMGTTask

B = 512
art = make_synthetic_dataset(
    num_nodes=10834, num_users=100, feat_dims=(1536, 768),
    interactions_per_user=2, avg_degree=16, seed=0,
)
args = TrainArgs(
    model_name="PMGT", dataset_name="bench", seed=0, num_epochs=1,
    train_batch_size=B, test_batch_size=B, lr=1e-4, mp_enabled=True,
    gradient_max_norm=5.0,
    extra=dict(hidden_size=128, intermediate_size=128, num_hidden_layers=5),
)
nodes = np.arange(2, art.num_nodes + 2, dtype=np.int32)
task = PMGTTask(args, art, nodes, nodes[:B])
graph = task.graph
scfg = task.sampling
targets = jnp.arange(2, 2 + B, dtype=jnp.int32)
key = jax.random.key(0)


def timeit(name, fn, *a, n=30):
    """Time fn as ONE jitted lax.scan of n iterations with a per-iteration
    folded key (the last positional arg must be a PRNG key), reduced to a
    scalar that is fetched once.

    Anything else lies through the axon tunnel: work whose results are
    never read is deferred/elided (4x more work measured "faster" with
    block_until_ready timing), per-call dispatch pays tunnel RTT, and
    loop-invariant identical calls get hoisted. All arrays must be passed
    through *a (NOT closed over): captured operands would become jit
    constants and push the sampler gathers off their fast path
    (CLAUDE.md rule).
    """
    assert a and isinstance(a[-1], jax.Array) and jnp.issubdtype(
        a[-1].dtype, jax.dtypes.prng_key
    ), f"{name}: last arg must be a PRNG key"

    from jax import flatten_util

    @jax.jit
    def run(*args):
        head, key = args[:-1], args[-1]

        def body(acc, i):
            out = fn(*head, jax.random.fold_in(key, i))
            # Reduce EVERY leaf: reducing only one would let XLA DCE the
            # computation of the rest (e.g. all other params' grads).
            flat, _ = flatten_util.ravel_pytree(
                jax.tree.map(lambda l: jnp.sum(l.astype(jnp.float32)), out)
            )
            return acc + jnp.sum(flat), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    t0 = time.time()
    float(run(*a))  # compile + warm (the fetch forces execution)
    ct = time.time() - t0
    # Time with a DIFFERENT key: the tunnel memoizes repeated identical
    # executions.
    a_timed = (*a[:-1], jax.random.fold_in(a[-1], 10_007))
    t0 = time.time()
    float(run(*a_timed))
    t = (time.time() - t0) / n
    print(f"{name:44s} {t*1000:8.2f} ms  (compile+warm {ct:.0f}s)")


ctx = task._get_ctx(("train", 0))
key = jax.random.key(9)
# The sampler jits take a SEED SCALAR (keys derive in-program); fold the
# harness key to a per-iteration uint32 seed to keep the data dependency.
timeit(
    "sample_all_contexts (N=10836)",
    lambda g, nodes, k: task._sample_all_fn(
        g, nodes, jax.random.bits(k, dtype=jnp.uint32)
    ),
    graph, task._all_nodes, key, n=5,
)
timeit(
    "sample_all_pairs (N=10836)",
    lambda g, k: task._sample_pairs_train_fn(
        g, jax.random.bits(k, dtype=jnp.uint32)
    ),
    graph, key, n=5,
)
timeit(
    "sample_pairs (B)",
    lambda g, t, k: sample_pairs(g, t, k, scfg, True),
    graph, targets, key,
)
timeit(
    "make_batch_cached (B)",
    lambda g, c, t, k: make_pretrain_batch_cached(
        g, c[0], c[1], t, k, scfg, True, pair_cache=c[2]
    ),
    graph, ctx, targets, key,
)


def fwd_bwd(params, tables, g, c, t, k):
    def loss(p):
        batch = make_pretrain_batch_cached(
            g, c[0], c[1], t, k, scfg, True, pair_cache=c[2]
        )
        out = task.model.apply({"params": p}, tables, batch,
                               deterministic=False, compute_nfr=True,
                               rngs={"dropout": k, "corruption": k})
        return out.loss
    return jax.grad(loss)(params)


timeit(
    "fwd+bwd (incl batch gathers, NFR, dropout)",
    fwd_bwd,
    task.state.params, task.feat_tables, graph, ctx, targets, key,
)
timeit(
    "full train step (no donation)",
    lambda s, g, ft, c, t, k: task._train_step_impl(
        s, g, ft, t, k, c, accum=1
    ),
    task.state, graph, task.feat_tables, ctx, targets, key,
)
