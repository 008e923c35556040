"""Generic training engine: epoch loop, early stopping, best/last
checkpointing, metric logging, resume.

Replaces the reference's PyTorch Lightning Trainer + callback stack
(base_trainer.py:266-409): EarlyStopping ↔ the patience loop here,
ModelCheckpoint(top-1 + last) ↔ Orbax best/last, MLFlowLogger ↔
RunRegistry, MLFlowExceptionCallback ↔ the FAILED status handler in the
CLI driver.

The engine is model-agnostic: a workload implements the small ``Task``
protocol below and everything else (PMGT pretraining, NCF, DCN) reuses the
same loop.
"""
from __future__ import annotations

import logging
import time
from typing import Any, Dict, Iterable, Optional, Protocol, Tuple

import jax
import numpy as np

from pmgt_tpu.train.checkpoints import (
    checkpoint_exists,
    read_best_info,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
    write_best_info,
)
from pmgt_tpu.train.registry import RunInfo, RunRegistry

logger = logging.getLogger("pmgt_tpu")


class Task(Protocol):
    """Workload plug-in for the engine."""

    state: Any  # pytree (params, opt_state, ...)

    def train_batches(self, epoch: int) -> Iterable[Any]:
        ...

    def train_step(self, state: Any, batch: Any) -> Tuple[Any, Dict[str, Any]]:
        ...

    def evaluate(self, state: Any, split: str) -> Dict[str, float]:
        ...

    def on_epoch_start(self, epoch: int) -> None:
        ...


class SWAAverager:
    """Stochastic Weight Averaging over end-of-epoch parameters.

    The reference vendors a Lightning SWA callback that is never registered
    (callbacks.py:44, base_trainer.py:316-320 — dead code); here it ships
    as a working optional feature: pass ``swa_start`` to ``fit`` and the
    running average is evaluated and checkpointed as ``swa`` at the end.
    Averaging matches the reference's dict-based swa_step semantics
    (utils/train.py:55-66): avg_n+1 = (avg_n * n + p) / (n + 1).
    """

    def __init__(self):
        self.n = 0
        self.avg = None

    def update(self, params) -> None:
        import jax
        import jax.numpy as jnp

        if self.avg is None:
            self.avg = jax.tree.map(jnp.asarray, params)
            self.n = 1
            return
        n = self.n

        self.avg = jax.tree.map(
            lambda a, p: (a * n + p) / (n + 1), self.avg, params
        )
        self.n += 1


def _is_better(value: float, best: Optional[float], mode: str) -> bool:
    if best is None or not np.isfinite(best):
        return True
    return value < best if mode == "min" else value > best


def _ckpt_payload(state, *, epoch, global_step, patience, best_value, has_best=True):
    """The one checkpoint payload schema (state + resume meta).

    Both save sites (the epoch loop's shared last/best payload and the
    eval_init best seed) MUST build through here — the restore paths
    template against this exact dict shape, so a field added at one call
    site but not the other would produce checkpoints with divergent
    schemas."""
    return {
        "state": state,
        "meta": {
            "epoch": epoch,
            "global_step": global_step,
            "patience": patience,
            "best_value": float(best_value) if best_value is not None else 0.0,
            "has_best": has_best,
        },
    }


def criterion_mode(criterion: str) -> str:
    """loss-like criteria are minimized, everything else maximized
    (reference base_trainer.py:283-287, hp_tuning.py:160)."""
    return "min" if "loss" in criterion else "max"


class _PreemptionGuard:
    """SIGTERM/SIGINT-safe training: the first signal requests a graceful
    stop (the epoch finishes, the last checkpoint is written, status is
    marked INTERRUPTED); a second signal falls through to the default
    handler. Production preemption handling the reference lacks entirely
    (its recovery is manual --run-id resume, SURVEY.md §5)."""

    def __init__(self):
        self.requested = False
        self._previous = {}

    def __enter__(self):
        import signal

        def handler(signum, frame):
            if self.requested:  # second signal: give up gracefully
                raise KeyboardInterrupt
            self.requested = True
            logger.warning(
                "received signal %s — finishing the current epoch, "
                "checkpointing, then stopping",
                signum,
            )

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._previous[sig] = signal.signal(sig, handler)
            except (ValueError, OSError):  # non-main thread etc.
                pass
        return self

    def __exit__(self, *exc):
        import signal

        for sig, prev in self._previous.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        return False


def fit(
    task: Task,
    *,
    num_epochs: int,
    early: int,
    early_criterion: str,
    registry: Optional[RunRegistry] = None,
    run: Optional[RunInfo] = None,
    log_every: int = 50,
    resume: bool = False,
    swa_start: Optional[int] = None,
    eval_interval: int = 1,
    ckpt_interval: int = 1,
    eval_init: bool = False,
) -> Dict[str, float]:
    """Run the train/validate loop. Returns the final validation metrics
    plus ``best`` (the best monitored value seen); with ``swa_start`` set,
    also ``swa/<metric>`` entries for the weight-averaged model.

    ``eval_interval=k`` evaluates/checkpoints/early-stops every k epochs
    instead of every epoch (patience then counts evaluation points, and
    preemption is honored at group boundaries). In scan mode a task that
    implements ``train_epochs`` runs each k-epoch group as ONE device
    dispatch — through a high-latency dispatch tunnel this amortizes the
    per-fetch round-trip stall k-fold. Per-epoch train losses are still
    logged for every epoch.

    ``eval_init=True`` evaluates the PRISTINE initialization before any
    training and seeds the best-checkpoint tracking with it: if no epoch
    beats the init on the monitor, the ``best`` checkpoint IS the init.
    Off by default — the reference's Lightning sanity-check validation
    never checkpoints — and meant for models initialized from trained
    weights (NeuMF-pre's fused GMF+MLP towers, PMGT-injected variants),
    where the first fine-tune epochs can move the monitor below the
    init's value and the reference protocol would silently report the
    degraded best-of-epochs instead (see tools/neumf_pre_bisect.py).

    ``ckpt_interval=k`` saves the resumable ``last`` checkpoint only at
    every k-th evaluation point of this run (so up to
    ``k * eval_interval`` epochs of work sit between ``last`` saves, and
    the cadence restarts after a resume) — plus ALWAYS when the run
    stops (final epoch, early stop, pruning, preemption), so a finished
    run is always resumable from its end. The metric-keyed ``best`` checkpoint is
    unaffected (the reference's Lightning contract,
    base_trainer.py:283-298, keys retention on the monitor only). Useful
    when the state is large relative to checkpoint bandwidth."""
    if eval_interval < 1:
        raise ValueError(f"eval_interval must be >= 1, got {eval_interval}")
    if ckpt_interval < 1:
        raise ValueError(f"ckpt_interval must be >= 1, got {ckpt_interval}")
    monitor = f"val/{early_criterion}"
    mode = criterion_mode(early_criterion)
    swa = SWAAverager() if swa_start is not None else None
    if swa is not None and eval_interval > 1:
        # Grouped dispatch only materializes the state at group ends, so
        # the average covers every eval_interval-th epoch's params, not
        # every epoch's — a different (coarser) SWA than eval_interval=1.
        logger.warning(
            "swa_start with eval_interval=%d averages only group-end "
            "params (every %d epochs), not every epoch",
            eval_interval,
            eval_interval,
        )

    if registry is not None and run is not None:
        # Clear any stale INTERRUPTED/FAILED status from a previous
        # process when resuming; the end-of-run status check in the CLI
        # reads this file to decide whether FINISHED may be written.
        registry.set_status(run, "RUNNING")

    state = task.state
    start_epoch = 0
    best_value: Optional[float] = None
    patience = 0
    global_step = 0

    ckpt_dir = run.ckpt_dir if run is not None else None

    if resume and ckpt_dir is not None:
        import os

        last = os.path.join(ckpt_dir, "last")
        # checkpoint_exists also promotes a crash-stranded aside copy
        # (kill inside checkpoint finalize) so preempted runs resume.
        if checkpoint_exists(last):
            payload = restore_checkpoint(
                last,
                _ckpt_payload(
                    state,
                    epoch=0,
                    global_step=0,
                    patience=0,
                    best_value=None,
                    has_best=False,
                ),
            )
            state = payload["state"]
            meta = payload["meta"]
            start_epoch = int(meta["epoch"]) + 1
            global_step = int(meta["global_step"])
            patience = int(meta["patience"])
            best_value = float(meta["best_value"]) if meta["has_best"] else None
            logger.info(
                "resumed from %s at epoch %d (step %d)", last, start_epoch, global_step
            )
            # Let the task fast-forward its per-step PRNG derivation so the
            # resumed run continues the original key stream instead of
            # replaying the already-consumed sampling/dropout keys.
            on_resume = getattr(task, "on_resume", None)
            if on_resume is not None:
                on_resume(global_step, start_epoch)

    val_metrics: Dict[str, float] = {}

    if eval_init and start_epoch == 0:
        init_metrics = task.evaluate(state, "valid")
        if monitor not in init_metrics:
            raise KeyError(
                f"early criterion {monitor!r} not in metrics "
                f"{sorted(init_metrics)}"
            )
        best_value = init_metrics[monitor]
        val_metrics = dict(init_metrics)
        logger.info(
            "init eval (before any training): %s",
            " ".join(f"{k} {v:.5f}" for k, v in init_metrics.items()),
        )
        if registry is not None and run is not None:
            registry.log_metrics(run, init_metrics, step=0, epoch=-1)
        if ckpt_dir is not None:
            import os

            payload = _ckpt_payload(
                state,
                epoch=-1,
                global_step=0,
                patience=0,
                best_value=best_value,
            )
            if jax.process_count() == 1:
                payload = jax.device_get(payload)
            save_checkpoint(
                os.path.join(ckpt_dir, "best"), payload, block=False
            )
            write_best_info(ckpt_dir, monitor, best_value, -1)

    epoch_runner = getattr(task, "train_epoch", None)
    if epoch_runner is not None and not getattr(task, "use_scan_epoch", True):
        epoch_runner = None

    guard = _PreemptionGuard()
    guard.__enter__()
    # Pipelined scan mode: the NEXT epoch's refresh + scan are dispatched
    # BEFORE this epoch's losses/metrics are fetched, so the dispatch RTT
    # and all host-side work (logging, checkpoint d2h, early-stop
    # bookkeeping) overlap device compute — device-side traces showed
    # ~20% of wall time going to the per-epoch fetch stall otherwise.
    # Safe because epoch runners do not donate their input state; on an
    # early stop the speculative epoch's result is simply discarded (the
    # reference's semantics only promise the best checkpoint, which is
    # already saved).
    def run_group(st, first: int, size: int):
        """Run ``size`` epochs; one fused dispatch when the task supports
        it, else sequential epoch dispatches. Returns (state, per-epoch
        device losses: a [size, steps] array or a list of arrays)."""
        if size > 1 and hasattr(task, "train_epochs"):
            return task.train_epochs(st, first, size)
        outs = []
        for e in range(first, first + size):
            task.on_epoch_start(e)
            st, losses = epoch_runner(st, e)
            outs.append(losses)
        return st, outs

    spec = None  # (state_after, losses_device, size) for the current group
    eval_count = 0  # evaluation points seen (ckpt_interval is keyed on these)
    try:
        e0 = start_epoch
        while e0 < num_epochs:
            g = min(eval_interval, num_epochs - e0)
            epoch = e0 + g - 1  # the group's evaluation epoch
            epoch_start = time.time()

            if epoch_runner is not None:
                if spec is None:
                    state_next, losses_dev = run_group(state, e0, g)
                else:
                    state_next, losses_dev, g_spec = spec
                    spec = None
                    assert g_spec == g, "speculative group size mismatch"
                nxt = e0 + g
                if nxt < num_epochs and not guard.requested:
                    gn = min(eval_interval, num_epochs - nxt)
                    s2, l2 = run_group(state_next, nxt, gn)
                    spec = (s2, l2, gn)
                state = state_next
                fetched = jax.device_get(losses_dev)
                epoch_losses = [
                    np.asarray(row, dtype=np.float64) for row in fetched
                ]
                batch_counts = [len(r) for r in epoch_losses]
            else:
                epoch_losses = []
                batch_counts = []
                done = 0
                for e in range(e0, e0 + g):
                    task.on_epoch_start(e)
                    train_losses = []
                    nb = 0
                    for batch in task.train_batches(e):
                        state, metrics = task.train_step(state, batch)
                        nb += 1
                        done += 1
                        if "loss" in metrics:
                            train_losses.append(metrics["loss"])
                        if log_every and nb % log_every == 0:
                            loss_val = float(
                                jax.device_get(metrics.get("loss", np.nan))
                            )
                            logger.info(
                                "epoch %d step %d loss %.5f",
                                e,
                                global_step + done,
                                loss_val,
                            )
                    batch_counts.append(nb)
                    epoch_losses.append(
                        np.asarray(
                            [float(jax.device_get(x)) for x in train_losses],
                            dtype=np.float64,
                        )
                    )

            # Per-epoch train-loss rows for the intermediate (unevaluated)
            # epochs of the group; the evaluation epoch's row below also
            # carries val metrics.
            step_base = global_step
            for j, e in enumerate(range(e0, epoch)):
                row = epoch_losses[j]
                step_base += batch_counts[j]
                if registry is not None and run is not None:
                    registry.log_metrics(
                        run,
                        {
                            "loss/train": float(row.mean())
                            if len(row)
                            else float("nan")
                        },
                        step=step_base,
                        epoch=e,
                    )
            global_step += sum(batch_counts)
            last_row = epoch_losses[-1]
            train_loss = (
                float(last_row.mean()) if len(last_row) else float("nan")
            )
            tail_loss = (
                float(last_row[-100:].mean()) if len(last_row) else float("nan")
            )

            val_metrics = task.evaluate(state, "valid")
            eval_count += 1
            elapsed = time.time() - epoch_start
            # loss/train is the TRUE epoch mean; the trailing-100-step mean
            # (closer to the end-of-epoch operating point) is logged
            # separately.
            logged = {
                "loss/train": train_loss,
                "loss/train_last100": tail_loss,
                **val_metrics,
                "epoch_time": elapsed,
            }
            if registry is not None and run is not None:
                registry.log_metrics(run, logged, step=global_step, epoch=epoch)
            logger.info(
                "epoch %d done in %.1fs: train_loss %.5f %s",
                epoch,
                elapsed,
                train_loss,
                " ".join(f"{k} {v:.5f}" for k, v in val_metrics.items()),
            )

            if swa is not None and epoch >= swa_start and hasattr(state, "params"):
                swa.update(state.params)

            if monitor not in val_metrics:
                raise KeyError(
                    f"early criterion {monitor!r} not in metrics {sorted(val_metrics)}"
                )
            value = val_metrics[monitor]
            improved = _is_better(value, best_value, mode)
            if improved:
                best_value = value
                patience = 0
            else:
                patience += 1

            task.state = state
            # Stop decisions are computed BEFORE checkpointing so a
            # stopping run always saves a resumable `last`, even when
            # ckpt_interval would skip this epoch.
            prune = task_should_prune(task, value, epoch)
            stop_early = bool(early and patience >= early)
            stopping = (
                guard.requested
                or prune
                or stop_early
                or (e0 + g) >= num_epochs
            )
            if ckpt_dir is not None:
                import os

                payload = _ckpt_payload(
                    state,
                    epoch=epoch,
                    global_step=global_step,
                    patience=patience,
                    best_value=best_value,
                )
                # Keyed on evaluation points, not absolute epochs: with
                # eval_interval=2 the eval epochs are 1,3,5,... and an
                # absolute (epoch+1) % k test would fire at every one of
                # them for even k (or at irregular cadences otherwise).
                do_last = stopping or eval_count % ckpt_interval == 0
                if (do_last or improved) and jax.process_count() == 1:
                    # ONE device->host fetch shared by the `last` and
                    # `best` saves: orbax's per-save d2h copy is the
                    # dominant checkpoint cost for large states (an
                    # improved epoch would otherwise transfer the state
                    # twice). Multi-host keeps jax arrays so every
                    # process writes its own shards.
                    payload = jax.device_get(payload)
                # Async saves: the write+rename overlaps the next epoch;
                # restore paths and the finally block finalize pending saves.
                if do_last:
                    save_checkpoint(
                        os.path.join(ckpt_dir, "last"), payload, block=False
                    )
                if improved:
                    save_checkpoint(
                        os.path.join(ckpt_dir, "best"), payload, block=False
                    )
                    write_best_info(ckpt_dir, monitor, best_value, epoch)

            if guard.requested:
                if registry is not None and run is not None:
                    registry.set_status(run, "INTERRUPTED")
                logger.warning(
                    "stopping after epoch %d (preemption signal); resume with "
                    "--run-id",
                    epoch,
                )
                break

            if prune:
                logger.info("trial pruned at epoch %d", epoch)
                break

            if stop_early:
                logger.info("early stopping at epoch %d (patience %d)", epoch, early)
                break

            e0 += g

    finally:
        guard.__exit__()
        wait_for_checkpoints()

    results = dict(val_metrics)
    results["best"] = float(best_value) if best_value is not None else float("nan")

    if swa is not None and swa.avg is not None and hasattr(state, "_replace"):
        swa_state = state._replace(params=swa.avg)
        swa_metrics = task.evaluate(swa_state, "valid")
        results.update({f"swa/{k}": v for k, v in swa_metrics.items()})
        if ckpt_dir is not None:
            import os

            save_checkpoint(
                os.path.join(ckpt_dir, "swa"),
                {"params": swa.avg, "n_models": swa.n},
            )
        logger.info(
            "SWA (%d models): %s",
            swa.n,
            " ".join(f"{k} {v:.5f}" for k, v in swa_metrics.items()),
        )
        if registry is not None and run is not None:
            registry.log_metrics(
                run,
                {f"swa/{k}": v for k, v in swa_metrics.items()},
                step=global_step,
                epoch=num_epochs,
            )
    return results


def task_should_prune(task: Task, value: float, epoch: int) -> bool:
    """Optuna-style pruning hook (reference base_trainer.py:186-191)."""
    hook = getattr(task, "should_prune", None)
    if hook is None:
        return False
    return bool(hook(value, epoch))
