"""Int8 row-quantized feature-table storage (pmgt_tpu/core/quant.py).

The frozen multimodal tables are the dominant HBM tenant and gather
traffic at production node counts; --feat-tables-dtype int8 halves both
vs bf16 with a bounded max|row|/254 per-element error. These tests pin:
the error bound, gather/dequant commutativity, full-model parity between
quantized and dense-dequantized tables (must be exact — same float ops),
both fusion strategies under quantization, placement (replicated and
row-sharded), and the end-to-end task path.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmgt_tpu.core.config import PMGTConfig
from pmgt_tpu.core.quant import (
    QuantizedTable,
    dense_table,
    is_quantized,
    prepare_feat_tables,
    quantize_table,
    table_rows,
    table_shape,
)
from pmgt_tpu.models.pmgt import PMGTForPreTraining
from pmgt_tpu.sampling.pairs import PretrainBatch

CFG = PMGTConfig(
    hidden_size=16,
    intermediate_size=16,
    num_hidden_layers=2,
    num_attention_heads=2,
    feat_hidden_sizes=(12, 8),
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


def _tiny_batch(b=4, p=3, s=4):
    rng = np.random.default_rng(2)
    return PretrainBatch(
        target_ids=jnp.asarray(rng.integers(2, 10, (b, s)), jnp.int32),
        target_mask=jnp.ones((b, s), jnp.float32),
        pair_ids=jnp.asarray(rng.integers(2, 10, (b, p, s)), jnp.int32),
        pair_mask=jnp.ones((b, p, s), jnp.float32),
        labels=jnp.asarray(rng.integers(0, 2, (b, p)).astype(np.float32)),
        pair_valid=jnp.ones((b, p), jnp.float32),
    )


def _tables_f32(rng, n=10):
    return [
        rng.normal(size=(n, f)).astype(np.float32)
        for f in CFG.feat_hidden_sizes
    ]


def _host_table(rng, n=10, f=12):
    t = rng.normal(size=(n, f)).astype(np.float32) * rng.uniform(
        0.1, 10.0, size=(n, 1)
    ).astype(np.float32)
    t[0] = 0.0  # <pad>
    t[1] = 0.0  # <mask>
    return t


def _quantize_dev(t):
    return jax.tree.map(jnp.asarray, quantize_table(np.asarray(t)))


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    t = _host_table(rng, n=64, f=33)
    qt = quantize_table(t)
    assert qt.q.dtype == np.int8 and qt.scale.dtype == np.float32
    assert np.all(qt.scale > 0)
    deq = np.asarray(qt.q, np.float32) * qt.scale
    bound = np.max(np.abs(t), axis=1, keepdims=True) / 254.0
    assert np.all(np.abs(deq - t) <= bound + 1e-9)
    # all-zero rows (<pad>/<mask>) reconstruct exactly zero
    assert np.all(deq[:2] == 0.0)


def test_table_rows_matches_dense_table_gather():
    rng = np.random.default_rng(1)
    qt = _quantize_dev(_host_table(rng))
    ids = jnp.asarray([[0, 3, 9], [1, 1, 2]], jnp.int32)
    rows = table_rows(qt, ids)
    expect = dense_table(qt)[ids]
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(expect))
    assert rows.dtype == jnp.float32
    # plain-array path unchanged
    dense = jnp.asarray(_host_table(rng))
    np.testing.assert_array_equal(
        np.asarray(table_rows(dense, ids)), np.asarray(dense[ids])
    )
    assert table_shape(qt) == (10, 12) and table_shape(dense) == (10, 12)
    assert is_quantized(qt) and not is_quantized(dense)


def test_pretrain_forward_quantized_vs_dense_dequant_exact():
    """The model's quantized path computes q[ids]*scale[ids]; feeding the
    pre-dequantized dense table instead computes (q*scale)[ids] — the same
    float multiplications on the same values, so the outputs must agree
    exactly (this pins that no *extra* numeric deviation hides in the
    quantized dataflow beyond quantization itself)."""
    rng = np.random.default_rng(3)
    batch = _tiny_batch()
    tables_f32 = _tables_f32(rng)
    qts = [_quantize_dev(t) for t in tables_f32]
    deq = [dense_table(qt) for qt in qts]

    model = PMGTForPreTraining(config=CFG, node_size=8)
    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "corruption": jax.random.key(2),
    }
    params = model.init(rngs, qts, batch, deterministic=False)
    apply_rngs = {"corruption": jax.random.key(5)}
    out_q = model.apply(
        params, qts, batch, deterministic=True, rngs=apply_rngs
    )
    out_d = model.apply(
        params, deq, batch, deterministic=True, rngs=apply_rngs
    )
    np.testing.assert_allclose(
        float(out_q.loss), float(out_d.loss), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_q.logits), np.asarray(out_d.logits),
        rtol=1e-6, atol=1e-6,
    )
    # ...and quantization itself moves the fp32-table loss only slightly
    out_f = model.apply(
        params, [jnp.asarray(t) for t in tables_f32], batch,
        deterministic=True, rngs=apply_rngs,
    )
    assert float(out_q.loss) == pytest.approx(float(out_f.loss), rel=0.05)


def test_fusion_strategy_parity_quantized():
    """gather_rows and project_tables stay math-identical when the tables
    are quantized (dequant, gather, and projection all commute)."""
    rng = np.random.default_rng(7)
    batch = _tiny_batch()
    qts = [_quantize_dev(t) for t in _tables_f32(rng)]
    cfg_p = dataclasses.replace(CFG, fusion_strategy="project_tables")
    cfg_g = dataclasses.replace(CFG, fusion_strategy="gather_rows")
    m_p = PMGTForPreTraining(config=cfg_p, node_size=8)
    m_g = PMGTForPreTraining(config=cfg_g, node_size=8)
    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "corruption": jax.random.key(2),
    }
    params = m_p.init(rngs, qts, batch, deterministic=False)
    apply_rngs = {"corruption": jax.random.key(5)}
    out_p = m_p.apply(params, qts, batch, deterministic=True, rngs=apply_rngs)
    out_g = m_g.apply(params, qts, batch, deterministic=True, rngs=apply_rngs)
    np.testing.assert_allclose(
        float(out_p.loss), float(out_g.loss), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p.logits), np.asarray(out_g.logits),
        rtol=1e-5, atol=1e-5,
    )


def test_prepare_feat_tables_dtypes_and_sharding():
    from pmgt_tpu.core.mesh import make_mesh

    rng = np.random.default_rng(5)
    mesh = make_mesh()
    tables = [_host_table(rng, n=16, f=8), _host_table(rng, n=16, f=4)]

    placed = prepare_feat_tables(tables, "int8", mesh)
    assert all(isinstance(t, QuantizedTable) for t in placed)
    assert placed[0].q.dtype == jnp.int8
    assert placed[0].scale.shape == (16, 1)

    bf16 = prepare_feat_tables(tables, "bfloat16", mesh)
    assert bf16[0].dtype == jnp.bfloat16
    f32 = prepare_feat_tables(tables, "float32", mesh)
    assert f32[0].dtype == jnp.float32

    with pytest.raises(ValueError):
        prepare_feat_tables(tables, "int4", mesh)

    # row-sharded quantized tables: both leaves shard on axis 0 and the
    # gathered rows match the replicated ones
    sharded = prepare_feat_tables(tables, "int8", mesh, shard=True)
    ids = jnp.asarray([0, 5, 15], jnp.int32)

    @jax.jit
    def gather(t):
        return table_rows(t, ids)

    np.testing.assert_array_equal(
        np.asarray(gather(sharded[0])), np.asarray(gather(placed[0]))
    )


def test_pmgt_task_trains_with_int8_tables():
    """End-to-end: a PMGT train epoch + eval with
    --feat-tables-dtype int8 runs and produces a finite loss."""
    from pmgt_tpu.core.config import TrainArgs
    from pmgt_tpu.data.synthetic import make_synthetic_dataset
    from pmgt_tpu.tasks.pmgt_task import PMGTTask

    art = make_synthetic_dataset(
        num_nodes=24, num_users=8, feat_dims=(12, 8),
        interactions_per_user=2, avg_degree=4, seed=0,
    )
    args = TrainArgs(
        model_name="PMGT", dataset_name="t", seed=0, num_epochs=1,
        train_batch_size=8, test_batch_size=8, lr=1e-3,
        mp_enabled=False, gradient_max_norm=5.0,
        extra=dict(
            hidden_size=16, intermediate_size=16, num_hidden_layers=1,
            feat_tables_dtype="int8",
        ),
    )
    nodes = np.arange(2, 26, dtype=np.int32)
    task = PMGTTask(args, art, nodes[:16], nodes[16:])
    assert all(is_quantized(t) for t in task.feat_tables)
    state, losses = task.train_epoch(task.state, epoch=0)
    losses = np.asarray(losses)
    assert losses.size > 0 and np.all(np.isfinite(losses))
    metrics = task.evaluate(state)
    assert np.isfinite(list(metrics.values())[0])
