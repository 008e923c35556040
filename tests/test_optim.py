"""Optimizer factory tests: no-decay masking and schedules."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pmgt_tpu.train.optim import make_optimizer, make_schedule, no_decay_mask


def test_no_decay_mask_paths():
    params = {
        "dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
        "norm": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))},
        "embed": {"embedding": jnp.ones((3, 2))},
    }
    mask = no_decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["norm"]["scale"] is False
    assert mask["norm"]["bias"] is False
    assert mask["embed"]["embedding"] is True  # embeddings DO decay (ref)


def test_weight_decay_only_on_masked():
    params = {
        "dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
    }
    tx = make_optimizer(params, lr=0.0, decay=0.1)  # lr=0 isolates decay? no:
    # adamw applies decay * lr; use lr=1, zero grads instead.
    tx = make_optimizer(params, lr=1.0, decay=0.1)
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    # kernel decayed, bias untouched
    assert float(new["dense"]["kernel"][0, 0]) == pytest.approx(0.9)
    assert float(new["dense"]["bias"][0]) == pytest.approx(1.0)


def test_schedule_warmup_and_linear_decay():
    sched = make_schedule(1.0, "linear", total_steps=100, warmup_ratio=0.1)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(0.5)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)


def test_schedule_constant():
    sched = make_schedule(0.3, None, total_steps=10)
    assert float(sched(0)) == pytest.approx(0.3)
    assert float(sched(9)) == pytest.approx(0.3)


@pytest.mark.parametrize(
    "stype", ["cosine", "cosine_with_restarts", "polynomial", "constant_with_warmup"]
)
def test_schedules_finite(stype):
    sched = make_schedule(1e-3, stype, total_steps=50, warmup_ratio=0.1)
    vals = [float(sched(i)) for i in range(55)]
    assert all(np.isfinite(v) and v >= 0 for v in vals)


def test_gradient_clipping():
    params = {"w": jnp.ones((2,))}
    tx = make_optimizer(params, optim="sgd", lr=1.0, gradient_max_norm=1.0)
    state = tx.init(params)
    grads = {"w": jnp.asarray([30.0, 40.0])}  # norm 50 → scaled to 1
    updates, _ = tx.update(grads, state, params)
    norm = float(jnp.linalg.norm(updates["w"]))
    assert norm == pytest.approx(1.0, rel=1e-4)


def test_sgd_variant():
    params = {"w": jnp.ones((2,))}
    tx = make_optimizer(params, optim="sgd", lr=0.5)
    updates, _ = tx.update({"w": jnp.asarray([1.0, 1.0])}, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["w"]), [-0.5, -0.5])
