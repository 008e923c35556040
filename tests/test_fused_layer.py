"""Fused-layer Pallas kernel vs the standard per-op layer (interpret mode
on CPU; same kernels compile for TPU via Mosaic)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmgt_tpu.core.config import PMGTConfig
from pmgt_tpu.models.pmgt import (
    FusedPMGTLayer,
    PMGTLayer,
    convert_layer_params,
)

CFG = PMGTConfig(
    hidden_size=16,
    intermediate_size=24,
    num_hidden_layers=1,
    num_attention_heads=1,
    feat_hidden_sizes=(8, 8),
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
    beta=0.4,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 6, 16)).astype(np.float32))
    mask = np.zeros((5, 1, 1, 6), np.float32)
    mask[:, :, :, 5:] = np.finfo(np.float32).min
    mask = jnp.asarray(mask)

    std = PMGTLayer(CFG)
    std_params = std.init(jax.random.key(0), x, mask, True)["params"]
    fused_params = convert_layer_params(std_params)
    return x, mask, std, std_params, fused_params


def test_forward_matches_standard(setup):
    x, mask, std, std_params, fused_params = setup
    expected = std.apply({"params": std_params}, x, mask, True)
    fused = FusedPMGTLayer(CFG)
    got = fused.apply({"params": fused_params}, x, mask, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-5
    )


def test_input_gradients_match(setup):
    x, mask, std, std_params, fused_params = setup

    def loss_std(xx):
        return jnp.sum(std.apply({"params": std_params}, xx, mask, True) ** 2)

    fused = FusedPMGTLayer(CFG)

    def loss_fused(xx):
        return jnp.sum(fused.apply({"params": fused_params}, xx, mask, True) ** 2)

    gx = jax.grad(loss_std)(x)
    gf = jax.grad(loss_fused)(x)
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(gx), rtol=2e-3, atol=2e-4
    )


def test_parameter_gradients_match(setup):
    x, mask, std, std_params, fused_params = setup

    def loss_std(p):
        return jnp.sum(std.apply({"params": p}, x, mask, True) ** 2)

    fused = FusedPMGTLayer(CFG)

    def loss_fused(p):
        return jnp.sum(fused.apply({"params": p}, x, mask, True) ** 2)

    g_std = jax.grad(loss_std)(std_params)
    g_fused = jax.grad(loss_fused)(fused_params)
    g_std_flat = convert_layer_params(g_std)
    for name in g_fused:
        np.testing.assert_allclose(
            np.asarray(g_fused[name]),
            np.asarray(g_std_flat[name]),
            rtol=2e-3,
            atol=2e-4,
            err_msg=name,
        )


def test_grad_accumulation_across_tiles():
    """Batches spanning multiple backward tiles must accumulate weight
    grads correctly (grid-revisited output blocks)."""
    from pmgt_tpu.ops import fused_layer as fl

    old_fwd, old_bwd = fl.BLOCK_FWD, fl.BLOCK_BWD
    fl.BLOCK_FWD, fl.BLOCK_BWD = 4, 4  # force multiple tiles
    try:
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(10, 6, 16)).astype(np.float32))
        mask = jnp.zeros((10, 1, 1, 6), jnp.float32)

        std = PMGTLayer(CFG)
        std_params = std.init(jax.random.key(0), x, mask, True)["params"]
        fused_params = convert_layer_params(std_params)
        fused = FusedPMGTLayer(CFG)

        g_std = convert_layer_params(
            jax.grad(
                lambda p: jnp.sum(std.apply({"params": p}, x, mask, True) ** 2)
            )(std_params)
        )
        g_fused = jax.grad(
            lambda p: jnp.sum(fused.apply({"params": p}, x, mask, True) ** 2)
        )(fused_params)
        for name in g_fused:
            np.testing.assert_allclose(
                np.asarray(g_fused[name]),
                np.asarray(g_std[name]),
                rtol=2e-3,
                atol=2e-4,
                err_msg=name,
            )
    finally:
        fl.BLOCK_FWD, fl.BLOCK_BWD = old_fwd, old_bwd


def test_full_model_with_fused_layers():
    """PMGTForPreTraining with attention_impl=fused_layer runs and learns
    shapes correctly."""
    from pmgt_tpu.models.pmgt import PMGTForPreTraining
    from pmgt_tpu.sampling.pairs import PretrainBatch

    cfg = PMGTConfig(
        hidden_size=16,
        intermediate_size=16,
        num_hidden_layers=2,
        num_attention_heads=1,
        feat_hidden_sizes=(8, 8),
        attention_impl="fused_layer",
    )
    rng = np.random.default_rng(2)
    batch = PretrainBatch(
        target_ids=jnp.asarray(rng.integers(2, 10, (4, 6)), jnp.int32),
        target_mask=jnp.ones((4, 6), jnp.float32),
        pair_ids=jnp.asarray(rng.integers(2, 10, (4, 3, 6)), jnp.int32),
        pair_mask=jnp.ones((4, 3, 6), jnp.float32),
        labels=jnp.zeros((4, 3), jnp.float32),
        pair_valid=jnp.ones((4, 3), jnp.float32),
    )
    tables = [
        jnp.asarray(rng.normal(size=(12, 8)).astype(np.float32))
        for _ in range(2)
    ]
    model = PMGTForPreTraining(config=cfg, node_size=10)
    variables = model.init(
        {
            "params": jax.random.key(0),
            "dropout": jax.random.key(1),
            "corruption": jax.random.key(2),
        },
        tables,
        batch,
        deterministic=False,
    )
    # flat fused layout present
    assert "wq" in variables["params"]["bert"]["layer_0"]
    out = model.apply(
        variables,
        tables,
        batch,
        deterministic=False,
        rngs={"dropout": jax.random.key(3), "corruption": jax.random.key(4)},
    )
    assert np.isfinite(float(out.loss))
    # gradients flow
    grads = jax.grad(
        lambda p: model.apply(
            {"params": p},
            tables,
            batch,
            deterministic=True,
            compute_nfr=False,
        ).loss
    )(variables["params"])
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
