"""Row-sharded frozen feature tables at a node count where sharding is
the point (VERDICT r3 #5): 100k nodes x (1536+768) features on the
virtual 8-device CPU mesh, --shard-feat-tables + gather_rows.

The small-scale parity tests (test_sharding.py) prove the math; this one
proves the production configuration at production scale: per-device
table footprint really is ~1/8th of the total, and the sharded dataflow
(raw-row gather from a row-sharded table, XLA-inserted collectives)
trains with loss parity against replicated tables.

Runtime notes: exact per-occurrence sampling (ctx_cache=0) avoids the
whole-graph refresh (the 100k refresh is a TPU-sized program); the
encoder is kept tiny — the scale under test is the node axis, not the
model.
"""
import jax
import numpy as np
import pytest

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.data.synthetic import make_synthetic_dataset
from pmgt_tpu.tasks.pmgt_task import PMGTTask

NUM_NODES = 100_000


@pytest.fixture(scope="module")
def art100k():
    return make_synthetic_dataset(
        num_nodes=NUM_NODES,
        num_users=50,
        feat_dims=(1536, 768),
        interactions_per_user=2,
        avg_degree=8,
        seed=0,
    )


def _build(art, shard: bool) -> PMGTTask:
    args = TrainArgs(
        model_name="PMGT",
        dataset_name="scale",
        seed=0,
        num_epochs=1,
        train_batch_size=64,
        test_batch_size=64,
        lr=1e-3,
        mp_enabled=True,
        num_devices=8,
        extra=dict(
            hidden_size=16,
            intermediate_size=16,
            num_hidden_layers=1,
            hop_sampling_sizes=(8, 4, 2),
            max_ctx_neigh=5,
            ctx_cache=0,  # exact mode: no whole-graph refresh on CPU
            shard_feat_tables=shard,
            fusion_strategy="gather_rows",
        ),
    )
    nodes = np.arange(2, art.num_nodes + 2, dtype=np.int32)
    return PMGTTask(args, art, nodes, nodes[:64])


def test_sharded_tables_100k_footprint_and_parity(art100k):
    task_sh = _build(art100k, shard=True)

    # The tables really are row-sharded: each device holds ~1/8th.
    for t in task_sh.feat_tables:
        assert t.sharding.spec == jax.sharding.PartitionSpec("data")
        assert t.shape[0] >= NUM_NODES
        shard_bytes = t.addressable_shards[0].data.nbytes
        assert shard_bytes * 8 == t.nbytes
    total_mb = sum(t.nbytes for t in task_sh.feat_tables) / 2**20
    per_dev_mb = sum(
        t.addressable_shards[0].data.nbytes for t in task_sh.feat_tables
    ) / 2**20
    # bf16 (mp default): (1536+768)*2 B/node ≈ 440 MB total, ~55 MB/device
    assert total_mb > 400
    assert per_dev_mb < total_mb / 7.9

    # gather_rows is the strategy actually in effect (the raw-row gather
    # from the sharded table is the dataflow under test).
    assert task_sh.config.fusion_strategy == "gather_rows"

    def run_steps(task, n=2):
        losses = []
        it = iter(task.train_batches(0))
        for _ in range(n):
            task.state, metrics = task.train_step(task.state, next(it))
            losses.append(float(jax.device_get(metrics["loss"])))
        return losses

    losses_sh = run_steps(task_sh)
    assert all(np.isfinite(l) for l in losses_sh)

    # Loss parity with replicated tables: same seed -> same target/key
    # stream -> numerically matching losses (the jitted step is
    # placement-agnostic; XLA inserts the gather collectives).
    task_rep = _build(art100k, shard=False)
    for t in task_rep.feat_tables:
        assert t.sharding.spec == jax.sharding.PartitionSpec()
    losses_rep = run_steps(task_rep)
    np.testing.assert_allclose(losses_sh, losses_rep, rtol=2e-4)
