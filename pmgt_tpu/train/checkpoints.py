"""Orbax checkpoint save/restore with best/last retention.

Replaces the reference's Lightning ModelCheckpoint(save_top_k=1,
save_last=True) keyed on the early-stopping monitor
(base_trainer.py:283-298)."""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import orbax.checkpoint as ocp

_CHECKPOINTER: Optional[ocp.StandardCheckpointer] = None
# At most one in-flight async save: (tmp_path, final_path).
_PENDING: Optional[tuple] = None


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
    _PENDING = None
    _ckptr().wait_until_finished()
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)


def save_checkpoint(path: str, state: Any, block: bool = True) -> None:
    """Save a pytree, atomically replacing any existing checkpoint.

    With ``block=False`` the device->host copy happens now but the file
    write + rename complete in the background (orbax async save) — the
    training loop overlaps checkpointing with the next epoch. The next
    save (or ``wait_for_checkpoints``) finalizes it."""
    path = os.path.abspath(path)
    tmp = path + ".tmp_new"
    wait_for_checkpoints()  # at most one outstanding save
    shutil.rmtree(tmp, ignore_errors=True)
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
