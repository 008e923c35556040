"""Utility tests: dynamic gradient clipping, seeding, timing."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pmgt_tpu.utils import dynamic_clip_by_norm_history, log_elapsed_time, set_seed


def test_dynamic_clip_first_step_passes_through():
    tx = dynamic_clip_by_norm_history(window=4)
    params = {"w": jnp.zeros((2,))}
    state = tx.init(params)
    g = {"w": jnp.asarray([3.0, 4.0])}  # norm 5
    out, state = tx.update(g, state)
    np.testing.assert_allclose(np.asarray(out["w"]), [3.0, 4.0], rtol=1e-5)


def test_dynamic_clip_limits_spikes():
    tx = dynamic_clip_by_norm_history(window=8, clip_factor=1.0)
    params = {"w": jnp.zeros((2,))}
    state = tx.init(params)
    # establish a history of norm ~1
    for _ in range(6):
        g = {"w": jnp.asarray([0.6, 0.8])}
        _, state = tx.update(g, state)
    # a 100x spike must be clipped near the history statistics
    spike = {"w": jnp.asarray([60.0, 80.0])}
    out, state = tx.update(spike, state)
    clipped_norm = float(jnp.linalg.norm(out["w"]))
    assert clipped_norm < 2.0  # mean 1 + std 0 + eps ≈ 1.01


def test_dynamic_clip_composes_with_optimizer():
    tx = optax.chain(
        dynamic_clip_by_norm_history(window=4), optax.sgd(0.1)
    )
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray([1.0, 0.0])}, state, params)
    new = optax.apply_updates(params, updates)
    assert float(new["w"][0]) < 1.0


def test_set_seed_reproducible():
    set_seed(7)
    a = np.random.rand(3)
    set_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_log_elapsed_time_passthrough():
    @log_elapsed_time
    def f(x):
        return x * 2

    assert f(21) == 42
