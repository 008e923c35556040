"""Optimizer and LR-schedule factory.

Mirrors the reference's optimizer setup (base_trainer.py:38-69): AdamW with
a no-decay parameter group for biases and LayerNorm weights, or SGD. The
reference's scheduler path is dead code (its local ``get_scheduler``
shadows the transformers import and references a nonexistent arg,
base_trainer.py:24,71-90); here the transformers-style schedules are
implemented properly with optax.

The reference's DenseSparseAdam (optimizers.py) exists to cope with sparse
embedding gradients on GPU; on TPU the frozen feature tables are not
parameters at all and the trainable tables are dense and small, so plain
optax.adamw is the correct equivalent.
"""
from __future__ import annotations

import math
from typing import Optional

import optax


def no_decay_mask(params, frozen_names=()) -> object:
    """True (apply weight decay) for every parameter except biases and
    LayerNorm scales — the reference's no-decay group is
    ``["bias", "LayerNorm.weight"]`` (base_trainer.py:42).

    ``frozen_names``: top-level module names excluded from decay as well
    (frozen tables get zeroed grads in the train step; excluding them here
    keeps AdamW's decoupled weight decay from moving them)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decay_for_path(path) -> bool:
        keys = [
            str(getattr(k, "key", getattr(k, "name", k))) for k in path
        ]
        if keys and keys[0] in frozen_names:
            return False
        name = keys[-1] if keys else ""
        if name == "bias":
            return False
        # flax LayerNorm scale parameters are named "scale".
        if name == "scale":
            return False
        return True

    mask_flat = [decay_for_path(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def make_schedule(
    lr: float,
    scheduler_type: Optional[str],
    total_steps: int,
    warmup_ratio: Optional[float] = None,
) -> optax.Schedule:
    """transformers-style schedules (train.py:39-52 flag surface)."""
    warmup_steps = int(total_steps * warmup_ratio) if warmup_ratio else 0
    decay_steps = max(total_steps - warmup_steps, 1)

    if scheduler_type is None or scheduler_type == "constant":
        body = optax.constant_schedule(lr)
    elif scheduler_type == "constant_with_warmup":
        body = optax.constant_schedule(lr)
    elif scheduler_type == "linear":
        body = optax.linear_schedule(lr, 0.0, decay_steps)
    elif scheduler_type == "cosine":
        body = optax.cosine_decay_schedule(lr, decay_steps)
    elif scheduler_type == "cosine_with_restarts":
        num_cycles = 3
        cycle = max(decay_steps // num_cycles, 1)
        body = optax.join_schedules(
            [optax.cosine_decay_schedule(lr, cycle) for _ in range(num_cycles)],
            [cycle * (i + 1) for i in range(num_cycles - 1)],
        )
    elif scheduler_type == "polynomial":
        body = optax.polynomial_schedule(lr, 1e-7, power=1.0, transition_steps=decay_steps)
    else:
        raise ValueError(f"unknown scheduler_type: {scheduler_type}")

    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, lr, warmup_steps)
        return optax.join_schedules([warmup, body], [warmup_steps])
    return body


def make_optimizer(
    params,
    optim: str = "adamw",
    lr: float = 1e-3,
    decay: float = 1e-2,
    scheduler_type: Optional[str] = None,
    total_steps: int = 1,
    warmup_ratio: Optional[float] = None,
    gradient_max_norm: Optional[float] = None,
    frozen_names=(),
) -> optax.GradientTransformation:
    schedule = make_schedule(lr, scheduler_type, total_steps, warmup_ratio)

    if optim == "adamw":
        base = optax.adamw(
            schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=decay,
            mask=no_decay_mask(params, frozen_names),
        )
    elif optim == "sgd":
        base = optax.sgd(schedule)
    else:
        raise ValueError(f"unknown optimizer: {optim}")

    chain = []
    if gradient_max_norm is not None and not math.isinf(gradient_max_norm):
        chain.append(optax.clip_by_global_norm(gradient_max_norm))
    chain.append(base)
    return optax.chain(*chain)
