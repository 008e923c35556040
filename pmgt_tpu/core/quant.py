"""Int8 row-quantized storage for the frozen multimodal feature tables.

The reference keeps the tables as fp32 ``nn.Embedding`` weights with
``requires_grad_(False)`` (reference pmgt/pmgt/models.py:40-54). On TPU
the tables are frozen *inputs*, and at production node counts they are
the dominant HBM tenant (1M nodes x 2304 feats = 9.2 GB fp32 / 4.6 GB
bf16) and the dominant per-step gather traffic in the ``gather_rows``
dataflow. Symmetric per-row int8 quantization halves both versus bf16:

    scale[n] = max(|table[n, :]|) / 127        (f32, one per row)
    q[n, :]  = round(table[n, :] / scale[n])   (int8)
    dequant  = q * scale                        (f32)

Per-element error is bounded by ``scale/2 = max|row|/254`` (~0.4% of the
row's max magnitude) — the features are inputs to a learned projection,
so the pretrain losses are insensitive at this magnitude (measured: see
ROADMAP). Rows 0/1 (<pad>/<mask>) are all-zero and quantize exactly
(zero-max rows get scale 1.0 so dequant stays exactly zero).

``QuantizedTable`` is a NamedTuple, hence a pytree: it flows through jit
parameters, ``jax.tree.map`` placement (replicate or row-shard — both
leaves shard on axis 0), and flax ``init``/``apply`` unchanged. Model
code routes every table read through :func:`table_rows` /
:func:`dense_table`, which accept plain arrays and quantized tables
alike; XLA fuses the dequantizing convert+multiply into the consuming
gather/matmul, so no dequantized copy is ever materialized in HBM.
"""
from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class QuantizedTable(NamedTuple):
    """Symmetric per-row int8 quantized [N, F] table."""

    q: Array  # int8 [N, F]
    scale: Array  # f32 [N, 1]


Table = Union[Array, np.ndarray, QuantizedTable]


def quantize_table(table: np.ndarray) -> QuantizedTable:
    """Host-side symmetric per-row int8 quantization."""
    t = np.asarray(table, dtype=np.float32)
    amax = np.max(np.abs(t), axis=1, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(t / scale), -127, 127).astype(np.int8)
    return QuantizedTable(q=q, scale=scale)


def is_quantized(table: Table) -> bool:
    return isinstance(table, QuantizedTable)


def table_rows(table: Table, ids: Array, dtype=None) -> Array:
    """Gather rows ``table[ids]`` -> [..., F].

    For a quantized table the gather moves int8 rows (plus one f32 scale
    per row) through HBM and dequantizes in ``dtype`` (default f32).
    Pass the compute dtype: dequantizing a wide gathered buffer in f32
    under a bf16 policy doubles the bytes the multiply sweeps (measured
    +2.4 ms/step at 100k nodes, B=512 — see ROADMAP).
    """
    dt = jnp.float32 if dtype is None else jnp.dtype(dtype)
    if is_quantized(table):
        return table.q[ids].astype(dt) * table.scale[ids].astype(dt)
    rows = jnp.asarray(table)[ids]
    return rows if dtype is None else rows.astype(dt)


def dense_table(table: Table, dtype=None) -> Array:
    """The full [N, F] table as a dense array (dequantized if needed)."""
    if is_quantized(table):
        dt = jnp.float32 if dtype is None else jnp.dtype(dtype)
        return table.q.astype(dt) * table.scale.astype(dt)
    t = jnp.asarray(table)
    return t if dtype is None else t.astype(jnp.dtype(dtype))


def table_shape(table: Table):
    return table.q.shape if is_quantized(table) else np.shape(table)


def prepare_feat_tables(tables, dtype: str, mesh, shard: bool = False):
    """Cast/quantize and device-place the frozen feature tables.

    ``dtype`` in {"float32", "bfloat16", "int8"}; ``shard`` row-shards the
    node axis over the mesh (both QuantizedTable leaves shard on axis 0).
    Shared by the PMGT and PMGT_NCF tasks so every table-consuming
    workload exposes the same storage levers.
    """
    import jax

    from pmgt_tpu.core.mesh import replicate_host, shard_rows_host

    if dtype not in ("float32", "bfloat16", "int8"):
        raise ValueError(f"invalid feat_tables_dtype {dtype}")
    if dtype == "int8":
        cast = quantize_table
    elif dtype == "bfloat16":
        import ml_dtypes

        def cast(t):
            return np.asarray(t).astype(ml_dtypes.bfloat16)
    else:
        cast = np.asarray
    if shard:
        def place(t):
            return jax.tree.map(lambda x: shard_rows_host(mesh, x), t)
    else:
        def place(t):
            return replicate_host(mesh, t)
    return [place(cast(t)) for t in tables]
