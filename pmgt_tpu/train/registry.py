"""Filesystem run registry — the TPU build's system of record.

Replaces the reference's MLflow store (base_trainer.py:93-110,164-184):
run ids are the only checkpoint identity mechanism there, and resuming
re-reads hyperparameters from the store (e.g. pmgt/pmgt/trainer.py:74-81).
This registry keeps the same contract with plain files:

    <log_dir>/<experiment_name>/<run_id>/
        params.json      resolved TrainArgs (hyperparameter restore source)
        tags.json        user tags + host info
        status           RUNNING | FINISHED | FAILED
        metrics.jsonl    one {"step", "epoch", "name", "value"} per line
        checkpoints/
            best/        best checkpoint by the early-stopping monitor
            best.json    {"monitor", "value", "epoch"}
            last/        latest checkpoint
        artifacts/       run scripts etc.
"""
from __future__ import annotations

import json
import logging
import os
import platform
import shutil
import time
import uuid
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

logger = logging.getLogger("pmgt_tpu")


@dataclass
class RunInfo:
    run_id: str
    experiment_name: str
    run_dir: str

    @property
    def params(self) -> Dict[str, Any]:
        with open(os.path.join(self.run_dir, "params.json"), encoding="utf-8") as f:
            return json.load(f)

    @property
    def status(self) -> str:
        path = os.path.join(self.run_dir, "status")
        if not os.path.exists(path):
            return "UNKNOWN"
        with open(path, encoding="utf-8") as f:
            return f.read().strip()

    @property
    def ckpt_dir(self) -> str:
        return os.path.join(self.run_dir, "checkpoints")

    def metrics(self) -> List[Dict[str, Any]]:
        path = os.path.join(self.run_dir, "metrics.jsonl")
        if not os.path.exists(path):
            return []
        with open(path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]


def _is_primary() -> bool:
    """Only the primary process writes registry files under multi-host
    (every process computes identical metrics from replicated state, so
    non-primary writes would only duplicate/garble the jsonl streams)."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def _shared_run_id() -> str:
    """A run id every process agrees on. uuid4 would give each process a
    DIFFERENT id (divergent run dirs, split checkpoints); under
    multi-process the primary's id is broadcast to everyone."""
    run_id = uuid.uuid4().hex
    try:
        import jax

        nproc = jax.process_count()
    except Exception:  # jax not initialized yet: single-process
        return run_id
    if nproc > 1:
        # No blanket except here: a broadcast failure must RAISE. Falling
        # back to the local uuid would give every process its own run id —
        # divergent run dirs with checkpoint barriers across them (a hang
        # or a corrupted run), the exact split-brain this function exists
        # to prevent. A crash is strictly better.
        import numpy as np
        from jax.experimental import multihost_utils

        local = np.frombuffer(bytes.fromhex(run_id), dtype=np.uint8)
        shared = np.asarray(multihost_utils.broadcast_one_to_all(local))
        run_id = bytes(shared.tolist()).hex()
    return run_id


def _sync(name: str) -> None:
    try:
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)
    except Exception:
        pass


class RunRegistry:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def create_run(
        self,
        experiment_name: str,
        params: Dict[str, Any],
        run_name: Optional[str] = None,
        tags: Optional[Dict[str, Any]] = None,
        run_script: Optional[str] = None,
        run_id: Optional[str] = None,
    ) -> RunInfo:
        run_id = run_id or _shared_run_id()
        run_dir = os.path.join(self.log_dir, experiment_name, run_id)
        os.makedirs(os.path.join(run_dir, "checkpoints"), exist_ok=True)
        os.makedirs(os.path.join(run_dir, "artifacts"), exist_ok=True)

        if _is_primary():
            all_tags = {
                "run_name": run_name,
                "host": platform.node(),
                "created_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            all_tags.update(tags or {})

            with open(
                os.path.join(run_dir, "params.json"), "w", encoding="utf-8"
            ) as f:
                json.dump(params, f, indent=2, default=str)
            with open(
                os.path.join(run_dir, "tags.json"), "w", encoding="utf-8"
            ) as f:
                json.dump(all_tags, f, indent=2, default=str)
            if run_script and os.path.exists(run_script):
                shutil.copy(
                    run_script,
                    os.path.join(
                        run_dir, "artifacts", os.path.basename(run_script)
                    ),
                )
        info = RunInfo(run_id, experiment_name, run_dir)
        self.set_status(info, "RUNNING")
        _sync(f"run_created:{run_id}")
        return info

    def get_run(self, run_id: str) -> RunInfo:
        """Find a run by id across experiments (reference get_run,
        base_trainer.py:93-97)."""
        if os.path.isdir(self.log_dir):
            for exp in sorted(os.listdir(self.log_dir)):
                run_dir = os.path.join(self.log_dir, exp, run_id)
                if os.path.isdir(run_dir):
                    return RunInfo(run_id, exp, run_dir)
        raise FileNotFoundError(f"run {run_id} not found under {self.log_dir}")

    def list_runs(self, experiment_name: Optional[str] = None) -> List[RunInfo]:
        """All runs in the registry (optionally one experiment), newest
        first by created_at tag — the store-browsing counterpart of the
        reference's MLflow UI workflow (base_trainer.py:93-110)."""
        runs: List[RunInfo] = []
        if not os.path.isdir(self.log_dir):
            return runs
        exps = (
            [experiment_name]
            if experiment_name is not None
            else sorted(os.listdir(self.log_dir))
        )
        for exp in exps:
            exp_dir = os.path.join(self.log_dir, exp)
            if not os.path.isdir(exp_dir):
                continue
            for rid in sorted(os.listdir(exp_dir)):
                run_dir = os.path.join(exp_dir, rid)
                # a run directory is one the registry created: it has
                # params.json (skip stray files/dirs)
                if os.path.isfile(os.path.join(run_dir, "params.json")):
                    runs.append(RunInfo(rid, exp, run_dir))

        def created(r: RunInfo) -> str:
            try:
                with open(
                    os.path.join(r.run_dir, "tags.json"), encoding="utf-8"
                ) as f:
                    return json.load(f).get("created_at") or ""
            except (OSError, ValueError):
                return ""

        return sorted(runs, key=created, reverse=True)

    def set_status(self, run: RunInfo, status: str) -> None:
        if not _is_primary():
            return
        with open(os.path.join(run.run_dir, "status"), "w", encoding="utf-8") as f:
            f.write(status + "\n")

    def log_metrics(
        self, run: RunInfo, metrics: Dict[str, float], step: int, epoch: int
    ) -> None:
        if not _is_primary():
            return
        with open(
            os.path.join(run.run_dir, "metrics.jsonl"), "a", encoding="utf-8"
        ) as f:
            for name, value in metrics.items():
                f.write(
                    json.dumps(
                        {
                            "step": int(step),
                            "epoch": int(epoch),
                            "name": name,
                            "value": float(value),
                        }
                    )
                    + "\n"
                )

    def get_ckpt_path(self, run_id: str, load_best: bool = False) -> str:
        """Resolve best/last checkpoint directory (reference get_ckpt_path,
        base_trainer.py:99-110)."""
        from pmgt_tpu.train.checkpoints import checkpoint_exists

        run = self.get_run(run_id)
        name = "best" if load_best else "last"
        path = os.path.join(run.ckpt_dir, name)
        if not checkpoint_exists(path):
            if load_best:  # fall back to last, as the reference does
                path = os.path.join(run.ckpt_dir, "last")
            if not checkpoint_exists(path):
                raise FileNotFoundError(f"no checkpoint under {run.ckpt_dir}")
        return path


def locate_eval_ckpt(
    registry: Optional["RunRegistry"],
    run: Optional[RunInfo],
    explicit_run_id: Optional[str],
    load_best: bool = True,
) -> Optional[str]:
    """Resolve the checkpoint to evaluate/export from, loudly.

    The reference fails hard when the run's checkpoint is missing
    (``get_ckpt_path`` raises, base_trainer.py:99-110) — it never scores
    random-init params as "test results". Mirror that: a missing checkpoint
    for an *explicitly requested* ``--run-id`` is a hard error; for the
    implicit just-trained run it downgrades to a WARNING (the in-memory
    params are the trained ones, only best-ckpt selection is lost).
    Returns None when there is nothing to restore.
    """
    run_id = explicit_run_id or (run.run_id if run is not None else None)
    if run_id is None:
        return None
    if registry is None:
        if explicit_run_id is not None:
            # The contract above: an explicit --run-id must never fall
            # through to scoring in-memory params.
            raise FileNotFoundError(
                f"--run-id {explicit_run_id!r} was given but no registry/"
                f"log-dir is available to resolve it"
            )
        return None
    try:
        return registry.get_ckpt_path(run_id, load_best=load_best)
    except FileNotFoundError:
        if explicit_run_id is not None:
            raise FileNotFoundError(
                f"--run-id {explicit_run_id!r} was given but no checkpoint "
                f"exists for it; refusing to evaluate in-memory params"
            ) from None
        logger.warning(
            "no checkpoint found for run %s; evaluating in-memory params",
            run_id,
        )
        return None
