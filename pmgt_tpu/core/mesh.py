"""Device mesh and sharding helpers.

The reference delegates multi-device training to PyTorch Lightning DDP
(reference base_trainer.py:309-311). The TPU-native equivalent is a
single-program `jax.sharding.Mesh`: the batch dimension is sharded over the
"data" axis, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI (and DCN across hosts).

Multi-host: call ``initialize_distributed`` (CLI: --coordinator-address /
--num-processes / --process-id, or the standard JAX_COORDINATOR_ADDRESS
env trio) before anything touches a backend; ``jax.devices()`` then spans
all processes and ``make_mesh`` builds the global mesh. Host arrays go
through ``put_along_data_axis`` / ``replicate_host`` which use
``jax.make_array_from_process_local_data`` / ``make_array_from_callback``
under multi-process (every process computes the identical global batch
from the shared seed and contributes its local shard) and plain
``device_put`` single-process. Smoke-tested with 2 CPU processes
(tests/test_multihost.py).
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

logger = logging.getLogger("pmgt_tpu")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-process JAX (the reference's DDP equivalent is
    Lightning's spawn, base_trainer.py:309-311). Must run before any
    backend is touched. Args fall back to the JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID environment trio; returns False
    (no-op) when neither is provided — single-process mode."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return False
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.devices()),
    )
    return True


def put_along_data_axis(mesh: Mesh, array, axis: int = 0) -> jax.Array:
    """Build a global array sharded over the data axis at ``axis``.

    ``array`` is the GLOBAL batch (identically computed on every process —
    all host-side shuffles/sampling are seeded); under multi-process each
    process contributes the slice its local devices own."""
    spec = [None] * np.ndim(array)
    spec[axis] = DATA_AXIS
    sharding = NamedSharding(mesh, P(*spec))
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    n = jax.process_count()
    rank = jax.process_index()
    dim = array.shape[axis]
    if dim % n:
        raise ValueError(
            f"global batch dim {dim} not divisible by {n} processes"
        )
    per = dim // n
    idx = [slice(None)] * np.ndim(array)
    idx[axis] = slice(rank * per, (rank + 1) * per)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(array[tuple(idx)]), array.shape
    )


def replicate_host(mesh: Mesh, tree):
    """Replicate a host pytree across the (possibly multi-process) mesh."""
    sharding = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def _rep(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree.map(_rep, tree)


def shard_rows_host(mesh: Mesh, array) -> jax.Array:
    """Place a host array with its leading (row) axis sharded over the data
    mesh — used for the frozen multimodal feature tables, whose
    [num_nodes, 1536+768] rows dominate HBM at production node counts
    (replicating them caps the node count per chip; sharding trades that
    for an XLA-inserted gather collective over ICI).

    Rows are zero-padded to a multiple of the mesh size; padding rows are
    never referenced (node ids stay < N+2).
    """
    array = np.asarray(array)
    n = mesh.size
    pad = (-array.shape[0]) % n
    if pad:
        array = np.concatenate(
            [array, np.zeros((pad,) + array.shape[1:], array.dtype)]
        )
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    return jax.make_array_from_callback(
        array.shape, sharding, lambda idx: array[idx]
    )


def place_graph(mesh: Mesh, graph, shard: bool = False):
    """Device-place a ``PaddedGraph`` (pass ``runtime_view()`` output).

    ``shard=False`` replicates every array (the single-chip / small-graph
    default). ``shard=True`` row-shards the per-node tables over the data
    axis the same way ``--shard-feat-tables`` shards the feature tables:
    beyond ~2M nodes the draw tables (``draw_packed``/``draw_packed16``)
    and neighbor rows are the dominant *unsharded* HBM tenant
    (capacity_probe: 2.5M nodes OOM with tables+graph persistent at
    7.1 GB even at int8) — sharding them removes the per-chip graph
    ceiling, trading an XLA-inserted gather collective over ICI per hop,
    exactly the feature-table deal (SURVEY §2.4).

    Shard rule: any array whose leading axis is the node axis — 2-D
    ``[N+2, ...]`` row tables and the flat ``[(N+2)*max_deg]`` element
    tables (node-major, so row-sharding keeps each node's slots on one
    device). 1-element placeholders and the tiny ``degrees`` vector
    (4 B/node) stay replicated: every wavefront step reads ``degrees``
    for its whole frontier, and at 4 B/node it is never the tenant that
    matters.
    """
    if not shard:
        return type(graph)(
            *(replicate_host(mesh, np.asarray(a)) for a in graph)
        )
    n_total = int(np.shape(graph.nbr_ids)[0])
    max_deg = int(np.shape(graph.nbr_ids)[1])
    flat_len = n_total * max_deg

    def _place(name, a):
        a = np.asarray(a)
        rows = a.shape[0] if a.ndim else 0
        # Decided by NAME first: at max_deg == 1 the [N+2] ``degrees``
        # vector is shape-indistinguishable from a flat element table
        # (flat_len == n_total) and would otherwise be sharded+padded,
        # paying a cross-device gather on the exact array the docstring
        # promises stays replicated.
        if name == "degrees":
            return replicate_host(mesh, a)
        if a.ndim >= 2 and rows == n_total:
            return shard_rows_host(mesh, a)
        if a.ndim == 1 and rows == flat_len:
            # Pad the flat [(N+2)*max_deg] tables so each device chunk is
            # a multiple of max_deg — node-major layout then keeps every
            # node's slots on ONE device (otherwise per-device chunks of
            # ceil(flat_len/n) split boundary nodes' slots across devices;
            # GSPMD stays correct either way, this is a locality choice).
            unit = mesh.size * max_deg
            pad = (-rows) % unit
            if pad:
                a = np.concatenate([a, np.zeros((pad,), a.dtype)])
            return shard_rows_host(mesh, a)
        return replicate_host(mesh, a)

    return type(graph)(
        *(_place(name, a) for name, a in zip(graph._fields, graph))
    )


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices but only "
                f"{len(devices)} are visible"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the (global) batch."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in ``batch`` with its leading axis sharded over the
    data axis. Leading dims must be divisible by the mesh size."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_params(mesh: Mesh, params):
    """Replicate a parameter pytree across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), params)


def gather_to_host(array) -> np.ndarray:
    """Bring a (possibly cross-process batch-sharded) device array fully
    to this host. Single-process: plain np.asarray; multi-process: an
    all-gather over processes so every host sees the full eval output."""
    if jax.process_count() == 1:
        return np.asarray(array)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(array, tiled=True))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
