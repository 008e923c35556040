"""Engine tests with a lightweight fake task: early stopping, best/last
checkpointing, resume, pruning."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from pmgt_tpu.train import engine
from pmgt_tpu.train.checkpoints import (
    read_best_info,
    restore_checkpoint,
    save_checkpoint,
)
from pmgt_tpu.train.registry import RunRegistry


class FakeTask:
    """Validation metric follows a scripted sequence."""

    def __init__(self, val_sequence, criterion="auc"):
        self.state = {"w": jnp.zeros((2,)), "epoch_count": jnp.asarray(0)}
        self.val_sequence = val_sequence
        self.criterion = criterion
        self.evals = 0

    def on_epoch_start(self, epoch):
        pass

    def train_batches(self, epoch):
        yield epoch

    def train_step(self, state, batch):
        state = dict(state)
        state["epoch_count"] = state["epoch_count"] + 1
        return state, {"loss": jnp.asarray(0.5)}

    def evaluate(self, state, split):
        v = self.val_sequence[min(self.evals, len(self.val_sequence) - 1)]
        self.evals += 1
        metrics = {f"val/{self.criterion}": v}
        metrics.setdefault("val/loss", 1.0 - v)
        return metrics


def test_early_stopping_patience():
    task = FakeTask([0.5, 0.6, 0.55, 0.54, 0.53])
    res = engine.fit(
        task, num_epochs=10, early=2, early_criterion="auc", log_every=0
    )
    # best at epoch 1 (0.6); patience 2 → stops after epoch 3
    assert task.evals == 4
    assert res["best"] == pytest.approx(0.6)


def test_loss_criterion_minimizes():
    task = FakeTask([0.4, 0.3, 0.35, 0.36], criterion="loss")
    res = engine.fit(
        task, num_epochs=4, early=2, early_criterion="loss", log_every=0
    )
    assert res["best"] == pytest.approx(0.3)


def test_checkpointing_and_resume(tmp_path):
    registry = RunRegistry(str(tmp_path / "logs"))
    run = registry.create_run("exp", {"p": 1})

    task = FakeTask([0.5, 0.8, 0.6])
    engine.fit(
        task,
        num_epochs=3,
        early=5,
        early_criterion="auc",
        registry=registry,
        run=run,
        log_every=0,
    )
    best = read_best_info(run.ckpt_dir)
    assert best["value"] == pytest.approx(0.8)
    assert best["epoch"] == 1
    assert os.path.isdir(os.path.join(run.ckpt_dir, "best"))
    assert os.path.isdir(os.path.join(run.ckpt_dir, "last"))

    # last checkpoint carries 3 completed epochs
    payload = restore_checkpoint(os.path.join(run.ckpt_dir, "last"))
    assert int(payload["meta"]["epoch"]) == 2
    assert int(payload["state"]["epoch_count"]) == 3

    # resume continues from epoch 3
    task2 = FakeTask([0.9])
    task2.state = payload["state"]
    engine.fit(
        task2,
        num_epochs=5,
        early=5,
        early_criterion="auc",
        registry=registry,
        run=run,
        resume=True,
        log_every=0,
    )
    payload2 = restore_checkpoint(os.path.join(run.ckpt_dir, "last"))
    assert int(payload2["meta"]["epoch"]) == 4
    # metrics got logged
    names = {m["name"] for m in run.metrics()}
    assert "val/auc" in names and "loss/train" in names


def test_eval_init_seeds_best_tracking(tmp_path):
    """eval_init=True: the pristine init is evaluated and seeds
    best-checkpoint tracking — when every epoch scores below it, the
    best checkpoint IS the init (epoch -1) and `best` reports its value
    (the NeuMF-pre case, QUALITY_NEUMF_PRE_BISECT_TG.json)."""
    registry = RunRegistry(str(tmp_path / "logs"))
    run = registry.create_run("exp", {"p": 1})

    # first eval (the init) scores 0.9; every epoch scores lower
    task = FakeTask([0.9, 0.6, 0.7, 0.65])
    res = engine.fit(
        task,
        num_epochs=3,
        early=5,
        early_criterion="auc",
        registry=registry,
        run=run,
        log_every=0,
        eval_init=True,
    )
    assert task.evals == 4  # init + 3 epochs
    assert res["best"] == pytest.approx(0.9)
    best = read_best_info(run.ckpt_dir)
    assert best["value"] == pytest.approx(0.9)
    assert best["epoch"] == -1
    # the best checkpoint holds the UNtrained state
    payload = restore_checkpoint(os.path.join(run.ckpt_dir, "best"))
    assert int(payload["state"]["epoch_count"]) == 0
    # the init metrics were logged at epoch -1
    rows = [m for m in run.metrics() if m["name"] == "val/auc"]
    assert any(m["epoch"] == -1 for m in rows)

    # an epoch that BEATS the init takes over as best
    run2 = registry.create_run("exp", {"p": 2})
    task2 = FakeTask([0.9, 0.95])
    res2 = engine.fit(
        task2,
        num_epochs=1,
        early=5,
        early_criterion="auc",
        registry=registry,
        run=run2,
        log_every=0,
        eval_init=True,
    )
    assert res2["best"] == pytest.approx(0.95)
    assert read_best_info(run2.ckpt_dir)["epoch"] == 0


def test_pruning_hook():
    class PrunableTask(FakeTask):
        def should_prune(self, value, epoch):
            return epoch >= 1

    task = PrunableTask([0.5, 0.6, 0.7])
    engine.fit(task, num_epochs=10, early=5, early_criterion="auc", log_every=0)
    assert task.evals == 2  # stopped after epoch 1


def test_registry_run_lookup(tmp_path):
    reg = RunRegistry(str(tmp_path))
    run = reg.create_run("expA", {"x": 1}, run_name="r", tags={"t": "v"})
    found = reg.get_run(run.run_id)
    assert found.run_dir == run.run_dir
    assert found.params == {"x": 1}
    reg.set_status(run, "FINISHED")
    assert found.status == "FINISHED"
    with pytest.raises(FileNotFoundError):
        reg.get_run("nonexistent")


def test_save_checkpoint_overwrites(tmp_path):
    p = str(tmp_path / "ck")
    save_checkpoint(p, {"a": jnp.asarray([1.0, 2.0])})
    save_checkpoint(p, {"a": jnp.asarray([3.0, 4.0])})
    out = restore_checkpoint(p)
    np.testing.assert_allclose(np.asarray(out["a"]), [3.0, 4.0])


def test_resume_invokes_on_resume_hook(tmp_path):
    """Resume must fast-forward the task's per-step PRNG derivation."""
    registry = RunRegistry(str(tmp_path / "logs"))
    run = registry.create_run("exp", {"p": 1})

    task = FakeTask([0.5, 0.8])
    engine.fit(
        task, num_epochs=2, early=5, early_criterion="auc",
        registry=registry, run=run, log_every=0,
    )

    class ResumableTask(FakeTask):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.resumed_at = None

        def on_resume(self, global_step, start_epoch):
            self.resumed_at = (global_step, start_epoch)

    task2 = ResumableTask([0.9])
    engine.fit(
        task2, num_epochs=4, early=5, early_criterion="auc",
        registry=registry, run=run, resume=True, log_every=0,
    )
    # 2 epochs x 1 step were completed before the resume point
    assert task2.resumed_at == (2, 2)


def test_guard_restores_signal_handlers_on_exception():
    """An exception inside the epoch loop must not leave the preemption
    guard's handlers installed (they would swallow the next Ctrl-C)."""
    import signal

    before = signal.getsignal(signal.SIGINT)

    class BrokenTask(FakeTask):
        def evaluate(self, state, split):
            return {"val/other": 1.0}  # missing the monitored metric

    with pytest.raises(KeyError):
        engine.fit(
            BrokenTask([0.5]), num_epochs=1, early=1,
            early_criterion="auc", log_every=0,
        )
    assert signal.getsignal(signal.SIGINT) is before


def test_async_checkpoint_save_and_finalize(tmp_path):
    """block=False saves finalize on wait_for_checkpoints/restore and the
    final checkpoint is atomic + readable."""
    import jax.numpy as jnp

    from pmgt_tpu.train.checkpoints import (
        restore_checkpoint,
        save_checkpoint,
        wait_for_checkpoints,
    )

    path = str(tmp_path / "ck")
    save_checkpoint(path, {"w": jnp.arange(4.0)}, block=False)
    # a second async save finalizes the first
    save_checkpoint(path, {"w": jnp.arange(4.0) * 2}, block=False)
    wait_for_checkpoints()
    got = restore_checkpoint(path)
    np.testing.assert_allclose(got["w"], np.arange(4.0) * 2)
    assert not os.path.exists(path + ".tmp_new")

    # restore alone also finalizes a pending save
    save_checkpoint(path, {"w": jnp.arange(4.0) * 3}, block=False)
    got = restore_checkpoint(path)
    np.testing.assert_allclose(got["w"], np.arange(4.0) * 3)


def test_locate_eval_ckpt_explicit_missing_raises(tmp_path):
    """An explicitly requested --run-id with no checkpoint must fail hard
    (reference semantics: get_ckpt_path raises, base_trainer.py:99-110),
    never silently score in-memory params."""
    from pmgt_tpu.train.registry import locate_eval_ckpt

    reg = RunRegistry(str(tmp_path))
    run = reg.create_run("exp", {})  # run exists, no checkpoint written
    with pytest.raises(FileNotFoundError, match="refusing to evaluate"):
        locate_eval_ckpt(reg, None, run.run_id)
    with pytest.raises(FileNotFoundError):
        locate_eval_ckpt(reg, None, "nonexistent-run")


def test_locate_eval_ckpt_implicit_missing_warns(tmp_path, caplog):
    """The implicit just-trained run downgrades to a WARNING and returns
    None (in-memory params are the trained ones)."""
    import logging

    from pmgt_tpu.train.registry import locate_eval_ckpt

    reg = RunRegistry(str(tmp_path))
    run = reg.create_run("exp", {})
    with caplog.at_level(logging.WARNING, logger="pmgt_tpu"):
        assert locate_eval_ckpt(reg, run, None) is None
    assert any("no checkpoint found" in r.message for r in caplog.records)
    # nothing requested at all -> None, no warning
    assert locate_eval_ckpt(reg, None, None) is None
    assert locate_eval_ckpt(None, run, None) is None


def test_locate_eval_ckpt_finds_existing(tmp_path):
    from pmgt_tpu.train.registry import locate_eval_ckpt

    reg = RunRegistry(str(tmp_path))
    run = reg.create_run("exp", {})
    save_checkpoint(os.path.join(run.ckpt_dir, "last"), {"w": jnp.ones((2,))})
    path = locate_eval_ckpt(reg, None, run.run_id)
    assert path.endswith("last")  # best falls back to last (reference quirk)


def test_scan_mode_train_loss_is_epoch_mean(tmp_path):
    """loss/train must be the TRUE epoch mean, not the last-100 tail
    (which is logged separately as loss/train_last100)."""

    class ScanTask(FakeTask):
        use_scan_epoch = True

        def train_epoch(self, state, epoch):
            # 200 per-step losses: mean 0.5 over the epoch, tail mean 0.0
            losses = jnp.concatenate(
                [jnp.full((100,), 1.0), jnp.full((100,), 0.0)]
            )
            return state, losses

    registry = RunRegistry(str(tmp_path / "logs"))
    run = registry.create_run("exp", {})
    task = ScanTask([0.5])
    engine.fit(
        task,
        num_epochs=1,
        early=5,
        early_criterion="auc",
        registry=registry,
        run=run,
        log_every=0,
    )
    metrics = {m["name"]: m["value"] for m in run.metrics()}
    assert metrics["loss/train"] == pytest.approx(0.5)
    assert metrics["loss/train_last100"] == pytest.approx(0.0)


def test_pipelined_scan_discards_speculative_epoch():
    """Scan mode speculatively dispatches epoch k+1 before epoch k's
    metrics are fetched. On early stop the speculative epoch's state must
    be discarded: task.state reflects only the PROCESSED epochs, and the
    best value matches the non-pipelined semantics."""

    class ScanTask(FakeTask):
        use_scan_epoch = True

        def __init__(self, seq):
            super().__init__(seq)
            self.state = {"count": jnp.asarray(0)}
            self.epoch_calls = []

        def train_epoch(self, state, epoch):
            self.epoch_calls.append(epoch)
            return {"count": state["count"] + 1}, jnp.ones((3,))

    # val sequence: best at epoch 1, patience 2 -> stops after epoch 3
    task = ScanTask([0.5, 0.9, 0.6, 0.5, 0.4, 0.3])
    res = engine.fit(
        task, num_epochs=10, early=2, early_criterion="auc", log_every=0
    )
    assert res["best"] == pytest.approx(0.9)
    assert task.evals == 4  # epochs 0..3 evaluated, like the eager path
    # epochs dispatched: 0..3 processed + the epoch-4 speculation
    assert task.epoch_calls == [0, 1, 2, 3, 4]
    # state counts only PROCESSED epochs (speculative epoch 4 discarded)
    assert int(task.state["count"]) == 4


def test_ckpt_interval_skips_intermediate_last_saves(tmp_path, monkeypatch):
    """ckpt_interval=3: `last` is written only at qualifying epochs plus
    the stop epoch; `best` still tracks every improvement."""
    from pmgt_tpu.train import engine as eng

    calls = []
    real_save = eng.save_checkpoint

    def spy(path, payload, block=True):
        calls.append(os.path.basename(path))
        return real_save(path, payload, block=block)

    monkeypatch.setattr(eng, "save_checkpoint", spy)

    registry = RunRegistry(str(tmp_path / "logs"))
    run = registry.create_run("exp", {})
    task = FakeTask([0.5, 0.8, 0.6, 0.9, 0.7, 0.65, 0.6])
    engine.fit(
        task,
        num_epochs=7,
        early=10,
        early_criterion="auc",
        registry=registry,
        run=run,
        log_every=0,
        ckpt_interval=3,
    )
    # last at epochs 2 and 5 ((e+1)%3==0) and the final epoch 6
    assert calls.count("last") == 3
    # best improved at epochs 0, 1, 3
    assert calls.count("best") == 3
    payload = restore_checkpoint(os.path.join(run.ckpt_dir, "last"))
    assert int(payload["meta"]["epoch"]) == 6


def test_ckpt_interval_saves_last_on_early_stop(tmp_path):
    """A run that early-stops between ckpt_interval points still leaves a
    resumable `last` at the stop epoch."""
    registry = RunRegistry(str(tmp_path / "logs"))
    run = registry.create_run("exp", {})
    task = FakeTask([0.9, 0.5, 0.4, 0.3])
    engine.fit(
        task,
        num_epochs=50,
        early=2,
        early_criterion="auc",
        registry=registry,
        run=run,
        log_every=0,
        ckpt_interval=100,
    )
    # early stop at epoch 2 (patience 2 after best at epoch 0)
    payload = restore_checkpoint(os.path.join(run.ckpt_dir, "last"))
    assert int(payload["meta"]["epoch"]) == 2
    assert read_best_info(run.ckpt_dir)["epoch"] == 0


def test_ckpt_interval_validation():
    task = FakeTask([0.5])
    with pytest.raises(ValueError):
        engine.fit(
            task, num_epochs=1, early=1, early_criterion="auc",
            ckpt_interval=0,
        )


def test_ckpt_interval_counts_eval_points_not_epochs(tmp_path, monkeypatch):
    """With eval_interval=2 the eval epochs are 1,3,5,...; an absolute
    (epoch+1) % 2 test would fire at EVERY eval point. ckpt_interval must
    count evaluation points instead: every 2nd eval plus the stop."""
    from pmgt_tpu.train import engine as eng

    calls = []
    real_save = eng.save_checkpoint

    def spy(path, payload, block=True):
        calls.append(os.path.basename(path))
        return real_save(path, payload, block=block)

    monkeypatch.setattr(eng, "save_checkpoint", spy)

    registry = RunRegistry(str(tmp_path / "logs"))
    run = registry.create_run("exp", {})
    # monotonically worsening so `best` saves only once (epoch 1's eval)
    task = FakeTask([0.9, 0.8, 0.7, 0.6])
    engine.fit(
        task,
        num_epochs=8,
        early=10,
        early_criterion="auc",
        registry=registry,
        run=run,
        log_every=0,
        eval_interval=2,
        ckpt_interval=2,
    )
    # 4 eval points (epochs 1,3,5,7); last at eval points 2 and 4
    # (epochs 3 and 7 — point 4 is also the stop)
    assert task.evals == 4
    assert calls.count("last") == 2


def test_checkpoint_crash_recovery_promotes_aside_copy(tmp_path):
    """Finalize renames the previous checkpoint ASIDE before the new one
    renames in, so a kill at any instant leaves a complete copy on disk;
    checkpoint_exists must promote a stranded aside copy back (the old
    rmtree-then-replace order could lose the only checkpoint)."""
    from pmgt_tpu.train.checkpoints import (
        checkpoint_exists,
        restore_checkpoint,
        save_checkpoint,
    )

    final = str(tmp_path / "last")
    save_checkpoint(final, {"w": jnp.asarray([1.0, 2.0])})
    # simulate the kill window between finalize's two renames
    os.replace(final, final + ".old")
    assert not os.path.isdir(final)
    assert checkpoint_exists(final)
    out = restore_checkpoint(final, {"w": jnp.zeros((2,))})
    np.testing.assert_allclose(np.asarray(out["w"]), [1.0, 2.0])


def test_checkpoint_save_replaces_previous_and_cleans_aside(tmp_path):
    from pmgt_tpu.train.checkpoints import restore_checkpoint, save_checkpoint

    final = str(tmp_path / "best")
    save_checkpoint(final, {"w": jnp.asarray([1.0])})
    save_checkpoint(final, {"w": jnp.asarray([2.0])})
    out = restore_checkpoint(final, {"w": jnp.zeros((1,))})
    assert float(np.asarray(out["w"])[0]) == 2.0
    assert not os.path.isdir(final + ".old")
