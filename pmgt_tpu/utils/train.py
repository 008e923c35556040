"""Training utilities.

``dynamic_clip_by_norm_history`` is the optax equivalent of the
reference's ``clip_gradient`` (utils/train.py:15-36): clip to
``mean + std`` of a moving window of recent gradient norms instead of a
fixed threshold. The reference implements it but trains with Lightning's
fixed ``gradient_clip_val`` instead (base_trainer.py:314); here both are
available (``make_optimizer(gradient_max_norm=...)`` for the fixed
variant).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class DynamicClipState(NamedTuple):
    norms: jnp.ndarray  # [window] ring buffer of recent gradient norms
    count: jnp.ndarray  # number of valid entries
    pos: jnp.ndarray  # ring position


def dynamic_clip_by_norm_history(
    window: int = 10, clip_factor: float = 1.0, eps: float = 1e-2
) -> optax.GradientTransformation:
    """Clip each step's gradient to ``mean + clip_factor * std`` of the
    last ``window`` observed norms (seeded with the first observation)."""

    def init(params):
        del params
        return DynamicClipState(
            norms=jnp.zeros((window,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
            pos=jnp.zeros((), jnp.int32),
        )

    def update(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)

        valid = jnp.arange(window) < jnp.maximum(state.count, 1)
        denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        mean = jnp.sum(jnp.where(valid, state.norms, 0.0)) / denom
        var = (
            jnp.sum(jnp.where(valid, (state.norms - mean) ** 2, 0.0)) / denom
        )
        threshold = jnp.where(
            state.count > 0,
            mean + clip_factor * jnp.sqrt(var) + eps,
            norm + eps,  # first step: no clipping
        )

        scale = jnp.minimum(1.0, threshold / jnp.maximum(norm, 1e-12))
        clipped = jax.tree.map(lambda g: g * scale, updates)

        recorded = jnp.minimum(norm, threshold)
        new_norms = state.norms.at[state.pos].set(recorded)
        new_state = DynamicClipState(
            norms=new_norms,
            count=jnp.minimum(state.count + 1, window),
            pos=(state.pos + 1) % window,
        )
        return clipped, new_state

    return optax.GradientTransformation(init, update)
