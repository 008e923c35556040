"""Device mesh and sharding helpers.

The reference delegates multi-device training to PyTorch Lightning DDP
(reference base_trainer.py:309-311). The TPU-native equivalent is a
single-program `jax.sharding.Mesh`: the batch dimension is sharded over the
"data" axis, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI. Multi-host DCN works unchanged once
`jax.distributed.initialize` has run.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


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


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
