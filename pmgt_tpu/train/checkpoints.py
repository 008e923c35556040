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


def _ckptr() -> ocp.StandardCheckpointer:
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree, atomically replacing any existing checkpoint."""
    path = os.path.abspath(path)
    tmp = path + ".tmp_new"
    shutil.rmtree(tmp, ignore_errors=True)
    ckptr = _ckptr()
    ckptr.save(tmp, state)
    ckptr.wait_until_finished()
    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree; with a template, leaves are restored with the
    template's shardings/dtypes."""
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
