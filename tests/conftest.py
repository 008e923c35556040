"""Test environment: run on CPU with a virtual 8-device mesh so sharding
tests exercise real multi-device code paths without TPU hardware."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's axon sitecustomize force-registers the TPU platform and
# overrides jax_platforms at interpreter start; undo it so tests run on the
# virtual 8-device CPU mesh.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# Keep one PRNG implementation across the whole suite regardless of test
# order (tasks switch the global default to the TPU-fast rbg otherwise).
os.environ["PMGT_TPU_PRNG"] = "threefry2x32"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_graph():
    """A small deterministic weighted graph for sampler/model tests."""
    from pmgt_tpu.graph.container import from_edges

    rs = np.random.RandomState(42)
    num_nodes = 50
    edges = []
    seen = set()
    for _ in range(300):
        u, v = rs.randint(0, num_nodes, size=2)
        if u == v or (min(u, v), max(u, v)) in seen:
            continue
        seen.add((min(u, v), max(u, v)))
        edges.append((int(u), int(v), float(rs.uniform(0.5, 2.0))))
    return from_edges(num_nodes, edges)
