"""--eval-interval: grouped epochs (one fused dispatch per group in scan
mode), eval/checkpoint/early-stop at group boundaries, per-epoch loss
rows preserved. Also PMGTTask.train_epochs PRNG-stream parity with
sequential train_epoch calls."""
import jax.numpy as jnp
import numpy as np
import pytest

from pmgt_tpu.core.config import TrainArgs
from pmgt_tpu.data.synthetic import make_synthetic_dataset
from pmgt_tpu.tasks.pmgt_task import PMGTTask
from pmgt_tpu.train import engine
from pmgt_tpu.train.registry import RunRegistry


class FakeTask:
    def __init__(self, val_sequence, criterion="auc"):
        self.state = {"count": jnp.asarray(0)}
        self.val_sequence = val_sequence
        self.criterion = criterion
        self.evals = 0

    def on_epoch_start(self, epoch):
        pass

    def evaluate(self, state, split):
        v = self.val_sequence[min(self.evals, len(self.val_sequence) - 1)]
        self.evals += 1
        return {f"val/{self.criterion}": v, "val/loss": 1.0 - v}


class GroupScanTask(FakeTask):
    """Scan task implementing BOTH train_epoch and train_epochs; records
    every dispatch as (start_epoch, group_size)."""

    use_scan_epoch = True

    def __init__(self, seq):
        super().__init__(seq)
        self.calls = []

    def train_epoch(self, state, epoch):
        self.calls.append((epoch, 1))
        return {"count": state["count"] + 1}, jnp.full((3,), 0.5)

    def train_epochs(self, state, start, k):
        self.calls.append((start, k))
        return {"count": state["count"] + k}, jnp.full((k, 3), 0.25)


class EagerGroupTask(FakeTask):
    """No scan runner: exercises the eager per-batch path under grouping."""

    def train_batches(self, epoch):
        yield epoch

    def train_step(self, state, batch):
        return {"count": state["count"] + 1}, {"loss": jnp.asarray(0.125)}


def test_eval_interval_validation():
    with pytest.raises(ValueError):
        engine.fit(
            FakeTask([0.5]),
            num_epochs=1,
            early=0,
            early_criterion="auc",
            eval_interval=0,
        )


def test_grouped_scan_dispatch_and_eval_cadence(tmp_path):
    """5 epochs at interval 2 -> fused groups (0,2),(2,2),(4,1); 3 evals;
    per-epoch loss rows for every epoch; state counts all 5 epochs plus
    no leftover speculative work."""
    registry = RunRegistry(str(tmp_path / "logs"))
    run = registry.create_run("exp", {})
    task = GroupScanTask([0.5, 0.6, 0.7])
    res = engine.fit(
        task,
        num_epochs=5,
        early=0,
        early_criterion="auc",
        registry=registry,
        run=run,
        log_every=0,
        eval_interval=2,
    )
    assert task.calls == [(0, 2), (2, 2), (4, 1)]
    assert task.evals == 3
    assert int(task.state["count"]) == 5
    assert res["best"] == pytest.approx(0.7)
    rows = run.metrics()
    by_epoch = {}
    for m in rows:
        by_epoch.setdefault(m["epoch"], {})[m["name"]] = m["value"]
    # every epoch has a train-loss row; only group-end epochs have val
    assert sorted(by_epoch) == [0, 1, 2, 3, 4]
    for e in range(5):
        assert "loss/train" in by_epoch[e]
    for e, has_val in [(0, False), (1, True), (2, False), (3, True), (4, True)]:
        assert ("val/auc" in by_epoch[e]) == has_val
    # grouped steps accumulate: epochs of size 3 steps each
    steps = {m["epoch"]: m["step"] for m in rows if m["name"] == "loss/train"}
    assert steps == {0: 3, 1: 6, 2: 9, 3: 12, 4: 15}


def test_grouped_early_stop_counts_evaluations():
    """Patience counts evaluation points: with interval 2 and patience 2,
    a best at the first eval and no improvement after stops at the third
    eval (epoch 5), having dispatched the epoch-6 speculation only."""
    task = GroupScanTask([0.9, 0.5, 0.4, 0.3])
    res = engine.fit(
        task,
        num_epochs=10,
        early=2,
        early_criterion="auc",
        log_every=0,
        eval_interval=2,
    )
    assert res["best"] == pytest.approx(0.9)
    assert task.evals == 3  # epochs 1, 3, 5
    # groups 0,2,4 processed + group 6 speculative
    assert task.calls == [(0, 2), (2, 2), (4, 2), (6, 2)]
    assert int(task.state["count"]) == 6  # speculation discarded


def test_eager_path_groups_eval(tmp_path):
    registry = RunRegistry(str(tmp_path / "logs"))
    run = registry.create_run("exp", {})
    task = EagerGroupTask([0.5, 0.6])
    engine.fit(
        task,
        num_epochs=3,
        early=0,
        early_criterion="auc",
        registry=registry,
        run=run,
        log_every=0,
        eval_interval=2,
    )
    assert task.evals == 2  # epochs 1 and 2
    assert int(task.state["count"]) == 3
    rows = run.metrics()
    train_rows = [m for m in rows if m["name"] == "loss/train"]
    assert sorted(m["epoch"] for m in train_rows) == [0, 1, 2]
    assert all(m["value"] == pytest.approx(0.125) for m in train_rows)


def test_interval_one_unchanged():
    """Default interval must preserve the per-epoch schedule exactly."""
    task = GroupScanTask([0.5, 0.6, 0.4, 0.3])
    engine.fit(
        task, num_epochs=3, early=0, early_criterion="auc", log_every=0
    )
    assert task.calls == [(0, 1), (1, 1), (2, 1)]
    assert task.evals == 3


@pytest.fixture(scope="module")
def art():
    return make_synthetic_dataset(
        num_nodes=40, num_users=20, feat_dims=(12, 8), avg_degree=6, seed=0
    )


def _make_task(art):
    args = TrainArgs(
        model_name="PMGT",
        dataset_name="syn",
        seed=0,
        num_epochs=3,
        train_batch_size=16,
        test_batch_size=16,
        lr=1e-2,
        num_devices=1,
        extra=dict(
            hidden_size=8,
            intermediate_size=8,
            num_hidden_layers=1,
            hop_sampling_sizes=(3, 2),
            max_ctx_neigh=3,
        ),
    )
    nodes = np.arange(2, 42, dtype=np.int32)
    return PMGTTask(args, art, nodes[:32], nodes[32:])


def test_train_epochs_matches_sequential(art):
    """train_epochs(k) must consume exactly the PRNG/shuffle/ctx streams
    of k sequential train_epoch calls: identical per-step losses and
    final parameters."""
    seq = _make_task(art)
    state = seq.state
    seq_losses = []
    for e in range(3):
        seq.on_epoch_start(e)
        state, losses = seq.train_epoch(state, e)
        seq_losses.append(np.asarray(losses))
    seq_params = state.params

    grp = _make_task(art)
    gstate, glosses = grp.train_epochs(grp.state, 0, 3)
    glosses = np.asarray(glosses)

    assert glosses.shape == (3, len(seq_losses[0]))
    np.testing.assert_allclose(
        glosses, np.stack(seq_losses), rtol=1e-5, atol=1e-6
    )
    import jax

    for a, b in zip(jax.tree.leaves(seq_params), jax.tree.leaves(gstate.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(b, np.float32),
            rtol=1e-5,
            atol=1e-6,
        )
    # the step counter advanced identically
    assert seq._step_count == grp._step_count
