"""Statistical parity: the jitted MCN sampler vs a literal host-side
reimplementation of the reference algorithm (hop-wise weighted draws with
replacement, frequency × hop-discount scoring, top-k context —
reference pmgt/pmgt/datasets.py:14-53).

Compares the marginal probability that each node appears in the target's
context set over many independent trials. This validates the full chain:
alias tables ≡ softmax(edge weights), hop frontier semantics, scoring, and
top-k selection."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmgt_tpu.bench.torch_reference import HostGraph, sample_context_host
from pmgt_tpu.core.config import SamplingConfig
from pmgt_tpu.graph.container import from_edges
from pmgt_tpu.sampling.mcn import sample_context, sample_context_dense

HOPS = (6, 4, 2)
MAX_CTX = 3


@pytest.fixture(scope="module")
def graph():
    # Small weighted graph with asymmetric structure so marginals are
    # nontrivial.
    edges = [
        (0, 1, 2.0), (0, 2, 0.5), (0, 3, 1.0),
        (1, 2, 1.5), (1, 4, 0.7),
        (2, 5, 2.5), (3, 4, 1.2), (4, 5, 0.4), (5, 6, 1.0),
        (6, 7, 2.0), (3, 7, 0.3),
    ]
    return from_edges(8, edges)


def _device_marginals(graph, target: int, trials: int) -> np.ndarray:
    cfg = SamplingConfig(hop_sampling_sizes=HOPS, max_ctx_neigh=MAX_CTX)
    targets = jnp.full((trials,), target, jnp.int32)
    ids, mask = jax.jit(
        lambda t, k: sample_context(graph, t, k, cfg)
    )(targets, jax.random.key(0))
    ids = np.asarray(ids)[:, 1:]
    mask = np.asarray(mask)[:, 1:] > 0
    counts = np.zeros(graph.num_total)
    for row, m in zip(ids, mask):
        for node in row[m]:
            counts[node] += 1
    return counts / trials


def _host_marginals(graph, target: int, trials: int, seed: int = 0) -> np.ndarray:
    np.random.seed(seed)
    host = HostGraph(
        np.asarray(graph.nbr_ids),
        np.asarray(graph.nbr_logits),
        np.asarray(graph.degrees),
    )
    counts = np.zeros(graph.num_total)
    for _ in range(trials):
        seq, n_ctx = sample_context_host(host, target, list(HOPS), MAX_CTX)
        for node in seq[1 : 1 + n_ctx]:
            counts[node] += 1
    return counts / trials


def test_context_marginals_match_host_reference(graph):
    trials_dev, trials_host = 4000, 1500
    target = 2  # node 0 in edge space
    dev = _device_marginals(graph, target, trials_dev)
    host = _host_marginals(graph, target, trials_host)

    # Compare where either puts nontrivial mass. Binomial noise at these
    # trial counts is ~0.012; allow 4 sigma.
    for node in range(2, graph.num_total):
        if max(dev[node], host[node]) > 0.02:
            assert abs(dev[node] - host[node]) < 0.06, (
                f"node {node}: device {dev[node]:.3f} vs host {host[node]:.3f}"
            )
    # total-variation distance over all nodes stays small
    tv = 0.5 * np.abs(dev - host).sum() / max(dev.sum(), 1e-9)
    assert tv < 0.05, f"TV distance {tv:.3f}"


def test_alias_and_dense_paths_agree(graph):
    """The alias-table production path and the categorical dense path must
    produce matching marginals (they share no RNG mechanics)."""
    cfg = SamplingConfig(hop_sampling_sizes=HOPS, max_ctx_neigh=MAX_CTX)
    trials = 4000
    targets = jnp.full((trials,), 4, jnp.int32)

    def marginals(fn, key):
        ids, mask = jax.jit(lambda t, k: fn(graph, t, k, cfg))(
            targets, jax.random.key(key)
        )
        ids = np.asarray(ids)[:, 1:]
        mask = np.asarray(mask)[:, 1:] > 0
        counts = np.zeros(graph.num_total)
        for row, m in zip(ids, mask):
            for node in row[m]:
                counts[node] += 1
        return counts / trials

    a = marginals(sample_context, 1)
    d = marginals(sample_context_dense, 2)
    for node in range(graph.num_total):
        if max(a[node], d[node]) > 0.02:
            assert abs(a[node] - d[node]) < 0.05, (
                f"node {node}: alias {a[node]:.3f} vs dense {d[node]:.3f}"
            )
