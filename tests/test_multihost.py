"""2-process multi-host smoke test (CPU): both processes must complete a
PMGT training epoch + eval over a global 8-device mesh and report
identical numbers (replicated params, sharded batches, cross-process
grad all-reduce)."""
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training_step():
    port = _free_port()
    env = dict(os.environ)
    # each child sets its own XLA device-count flag before backend init
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tools", "multihost_smoke.py"),
                "--process-id",
                str(pid),
                "--port",
                str(port),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        # Generous: the two processes share one pool CPU with whatever
        # else runs on the box; 600 s timed out under load (observed).
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, f"rc={p.returncode}\n{err[-3000:]}"
        outs.append(out)

    lines = [
        next(l for l in out.splitlines() if l.startswith("MULTIHOST_OK"))
        for out in outs
    ]
    # same mesh, same losses, same metrics on both hosts
    stripped = [re.sub(r"p\d/", "p?/", l) for l in lines]
    assert stripped[0] == stripped[1], lines
    assert "mesh=8" in lines[0]


def _launch_pair(extra_args, port, timeout=1500):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tools", "multihost_smoke.py"),
                "--process-id",
                str(pid),
                "--port",
                str(port),
            ]
            + extra_args,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"rc={p.returncode}\n{err[-3000:]}"
        outs.append(out)
    return outs


def _fit_lines(outs):
    return [
        next(l for l in out.splitlines() if l.startswith("MULTIHOST_FIT_OK"))
        for out in outs
    ]


def test_two_process_checkpoint_preempt_resume(tmp_path):
    """Multi-host hardening (engine + registry + Orbax over a 2-process
    mesh): a preempted fit checkpoints and marks INTERRUPTED with ONE
    shared run id (broadcast from the primary — uuid4 per process would
    split the run); a second 2-process launch resumes from the shared
    checkpoint and finishes. Registry files are written by the primary
    only; orbax saves/restores run collectively on both processes."""
    log_dir = str(tmp_path / "logs")

    # phase 1: fit 4 epochs, every process self-preempts at epoch 2
    outs = _launch_pair(
        [
            "--flow", "fit",
            "--log-dir", log_dir,
            "--num-epochs", "4",
            "--preempt-at-epoch", "2",
        ],
        _free_port(),
    )
    lines = _fit_lines(outs)
    fields = [dict(kv.split("=") for kv in l.split()[2:]) for l in lines]
    assert fields[0]["run"] == fields[1]["run"], lines  # one shared run id
    run_id = fields[0]["run"]
    assert all(f["status"] == "INTERRUPTED" for f in fields), lines
    # The engine pipelines: epoch 2's on_epoch_start (where the smoke
    # self-SIGTERMs) runs as epoch 1's speculative dispatch, so the
    # guard stops the run after epoch 1 — graceful, checkpointed,
    # resumable, identical on both processes.
    assert all(f["last_epoch"] == "1" for f in fields), lines
    # exactly one run dir exists, with primary-written registry files
    runs = os.listdir(os.path.join(log_dir, "mh"))
    assert runs == [run_id], runs
    run_dir = os.path.join(log_dir, "mh", run_id)
    assert os.path.exists(os.path.join(run_dir, "params.json"))
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "last"))

    # phase 2: resume on a fresh 2-process pair -> completes epochs 2..3
    outs = _launch_pair(
        [
            "--flow", "fit",
            "--log-dir", log_dir,
            "--num-epochs", "4",
            "--run-id", run_id,
        ],
        _free_port(),
    )
    lines = _fit_lines(outs)
    fields = [dict(kv.split("=") for kv in l.split()[2:]) for l in lines]
    assert all(f["status"] == "FINISHED" for f in fields), lines
    assert all(f["last_epoch"] == "3" for f in fields), lines
    # both processes reported identical resumed results
    stripped = [re.sub(r"p\d/", "p?/", l) for l in lines]
    assert stripped[0] == stripped[1], lines
    # metrics.jsonl: epochs 0..3, each logged exactly once (no replay,
    # no duplication from the secondary process)
    import json as _json

    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        recs = [_json.loads(l) for l in f if l.strip()]
    auc_epochs = [r["epoch"] for r in recs if r["name"] == "val/auc"]
    assert auc_epochs == [0, 1, 2, 3], auc_epochs
