"""Preemption-safe training: SIGTERM mid-training finishes the epoch,
writes the last checkpoint, marks the run INTERRUPTED, and resumes."""
import os
import signal

import jax.numpy as jnp
import pytest

from pmgt_tpu.train import engine
from pmgt_tpu.train.checkpoints import restore_checkpoint
from pmgt_tpu.train.registry import RunRegistry
from tests.test_engine import FakeTask


class SignalingTask(FakeTask):
    """Raises SIGTERM against itself during epoch 1's training."""

    def __init__(self, seq, signal_at_epoch=1):
        super().__init__(seq)
        self.signal_at_epoch = signal_at_epoch

    def train_step(self, state, batch):
        if batch == self.signal_at_epoch:  # batch carries the epoch index
            os.kill(os.getpid(), signal.SIGTERM)
        return super().train_step(state, batch)


def test_sigterm_checkpoints_and_stops(tmp_path):
    reg = RunRegistry(str(tmp_path))
    run = reg.create_run("exp", {})
    task = SignalingTask([0.5, 0.6, 0.7, 0.8], signal_at_epoch=1)
    engine.fit(
        task,
        num_epochs=4,
        early=5,
        early_criterion="auc",
        registry=reg,
        run=run,
        log_every=0,
    )
    # stopped after epoch 1 (2 evals), not 4
    assert task.evals == 2
    assert run.status == "INTERRUPTED"
    payload = restore_checkpoint(os.path.join(run.ckpt_dir, "last"))
    assert int(payload["meta"]["epoch"]) == 1

    # default handlers restored
    assert signal.getsignal(signal.SIGTERM) not in (None,)

    # resume continues from epoch 2
    task2 = SignalingTask([0.9], signal_at_epoch=-1)
    task2.state = payload["state"]
    res = engine.fit(
        task2,
        num_epochs=4,
        early=5,
        early_criterion="auc",
        registry=reg,
        run=run,
        resume=True,
        log_every=0,
    )
    assert task2.evals == 2  # epochs 2 and 3
    assert res["best"] == pytest.approx(0.9)
