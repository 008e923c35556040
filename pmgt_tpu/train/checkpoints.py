"""Orbax checkpoint save/restore with best/last retention.

Replaces the reference's Lightning ModelCheckpoint(save_top_k=1,
save_last=True) keyed on the early-stopping monitor
(base_trainer.py:283-298).

Multi-host: orbax saves/restores are collective (every process calls
them); the surrounding filesystem bookkeeping (clearing stale tmp dirs,
the atomic rename) happens on the primary process only, with
cross-process barriers so non-primaries never race the rename or read a
half-finalized directory. Assumes the checkpoint path is on storage all
hosts see (GCS/NFS — the standard TPU-pod arrangement; exercised by the
2-process smoke in tests/test_multihost.py)."""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import orbax.checkpoint as ocp

_CHECKPOINTER: Optional[ocp.StandardCheckpointer] = None
# At most one in-flight async save: (tmp_path, final_path).
_PENDING: Optional[tuple] = None


def _is_primary() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def _barrier(name: str) -> None:
    """Cross-process sync point; no-op single-process."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def _ckptr() -> ocp.StandardCheckpointer:
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def wait_for_checkpoints() -> None:
    """Finalize any in-flight async save (background write + atomic
    rename). Must run before reading a just-saved checkpoint and before
    process exit."""
    global _PENDING
    if _PENDING is None:
        return
    tmp, final = _PENDING
    _ckptr().wait_until_finished()
    # Primary-only rename; barrier so no process reads `final` before the
    # rename lands (or starts the next save over a half-moved tmp).
    # Order matters for crash safety: the previous copy is renamed ASIDE
    # (atomic) before the new one renames in, so a kill at any instant
    # leaves at least one complete checkpoint on disk — deleting `final`
    # before the replace (the old order) had a window that lost the only
    # copy (preemption between rmtree and os.replace -> resume silently
    # restarted from epoch 0). checkpoint_exists() promotes a stranded
    # aside copy back.
    if _is_primary() and os.path.isdir(tmp):  # tmp gone = already landed
        old = final + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(final):
            os.replace(final, old)
        os.replace(tmp, final)
        shutil.rmtree(old, ignore_errors=True)
    _barrier(f"ckpt_finalize:{final}")
    # Cleared only after success: a transient finalize failure leaves
    # _PENDING set so the next wait retries instead of abandoning the
    # in-flight save with a stale .tmp_new and a best.json pointing at
    # a checkpoint that never landed.
    _PENDING = None


def checkpoint_exists(path: str) -> bool:
    """True if a finalized checkpoint directory exists at ``path``.

    Promotes a crash-stranded aside copy first: a kill between
    finalize's two renames leaves ``path`` missing with the previous
    complete checkpoint at ``path + ".old"``."""
    path = os.path.abspath(path)
    old = path + ".old"
    if _is_primary() and not os.path.isdir(path) and os.path.isdir(old):
        os.replace(old, path)
    _barrier(f"ckpt_recover:{path}")
    return os.path.isdir(path)


def save_checkpoint(path: str, state: Any, block: bool = True) -> None:
    """Save a pytree, atomically replacing any existing checkpoint.

    With ``block=False`` the device->host copy happens now but the file
    write + rename complete in the background (orbax async save) — the
    training loop overlaps checkpointing with the next epoch. The next
    save (or ``wait_for_checkpoints``) finalizes it."""
    path = os.path.abspath(path)
    tmp = path + ".tmp_new"
    wait_for_checkpoints()  # at most one outstanding save
    if _is_primary():
        shutil.rmtree(tmp, ignore_errors=True)
    _barrier(f"ckpt_pre_save:{tmp}")
    ckptr = _ckptr()
    ckptr.save(tmp, state)
    global _PENDING
    _PENDING = (tmp, path)
    if block:
        wait_for_checkpoints()


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree; with a template, leaves are restored with the
    template's shardings/dtypes."""
    wait_for_checkpoints()
    path = os.path.abspath(path)
    if template is not None:
        return _ckptr().restore(path, template)
    return _ckptr().restore(path)


def write_best_info(ckpt_dir: str, monitor: str, value: float, epoch: int) -> None:
    if not _is_primary():
        return
    with open(os.path.join(ckpt_dir, "best.json"), "w", encoding="utf-8") as f:
        json.dump(
            {"monitor": monitor, "value": float(value), "epoch": int(epoch)}, f
        )


def read_best_info(ckpt_dir: str) -> Optional[dict]:
    path = os.path.join(ckpt_dir, "best.json")
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return json.load(f)
