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
    t0 = time.time()
    jax.block_until_ready(fn(*a))
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    t = (time.time() - t0) / n
    print(f"{name:44s} {t*1000:8.2f} ms  (compile {ct:.0f}s)")


ctx = task._sample_all_fn(jax.random.key(1))
timeit("sample_all_contexts (N=10836)", task._sample_all_fn, jax.random.key(2), n=5)
timeit("sample_pairs (B)", jax.jit(lambda t, k: sample_pairs(graph, t, k, scfg, True)), targets, key)
timeit("make_batch_cached (B)", jax.jit(
    lambda t, k: make_pretrain_batch_cached(graph, ctx[0], ctx[1], t, k, scfg, True)), targets, key)

batch = jax.jit(lambda t, k: make_pretrain_batch_cached(graph, ctx[0], ctx[1], t, k, scfg, True))(targets, key)

def fwd_only(params, b):
    out = task.model.apply({"params": params}, task.feat_tables, b,
                           deterministic=True, compute_nfr=False)
    return out.loss

timeit("encoder fwd only (no NFR)", jax.jit(fwd_only), task.state.params, batch)

def fwd_bwd(params, b, k):
    def loss(p):
        out = task.model.apply({"params": p}, task.feat_tables, b,
                               deterministic=False, compute_nfr=True,
                               rngs={"dropout": k, "corruption": k})
        return out.loss
    return jax.grad(loss)(params)

timeit("fwd+bwd (with NFR, dropout)", jax.jit(fwd_bwd), task.state.params, batch, key)
timeit("full train step", lambda: task._train_step_fn(task.state, targets, key, ctx), n=30)
