"""Pallas dual-attention kernel vs the XLA implementation (interpret mode
on CPU; the same kernel compiles for TPU via Mosaic)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmgt_tpu.models.pmgt import dual_attention_xla
from pmgt_tpu.ops.dual_attention import dual_attention_pallas


def _inputs(b=8, h=2, s=6, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v, c = (
        jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        for _ in range(4)
    )
    mask = np.zeros((b, 1, 1, s), np.float32)
    mask[:, :, :, s - 1 :] = np.finfo(np.float32).min
    return q, k, v, c, jnp.asarray(mask)


@pytest.mark.parametrize("beta", [0.0, 0.5, 1.0])
def test_forward_matches_xla(beta):
    q, k, v, c, mask = _inputs()
    a = dual_attention_xla(q, k, v, c, mask, beta, 0.0, True, None)
    b = dual_attention_pallas(q, k, v, c, mask, beta, 0.0, True, None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_gradients_match_xla():
    q, k, v, c, mask = _inputs(seed=1)

    def loss_x(q, k, v, c):
        return jnp.sum(dual_attention_xla(q, k, v, c, mask, 0.3, 0.0, True, None) ** 2)

    def loss_p(q, k, v, c):
        return jnp.sum(
            dual_attention_pallas(q, k, v, c, mask, 0.3, 0.0, True, None) ** 2
        )

    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(q, k, v, c)
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, c)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_backward_kernel_with_dropout_masks():
    """The hand-written backward kernel must match jax.vjp of the XLA
    formulation given identical dropout masks."""
    import numpy as np

    from pmgt_tpu.ops.dual_attention import _fused, _xla_forward

    rng = np.random.default_rng(5)
    b, s, d = 5, 6, 16
    q, k, v, c = (
        jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
        for _ in range(4)
    )
    mask = np.zeros((b, 1, s), np.float32)
    mask[:, :, s - 1 :] = np.finfo(np.float32).min
    mask = jnp.asarray(mask)
    keep = 0.7
    m1 = jnp.asarray(rng.random((b, s, s)) < keep)
    m2 = jnp.asarray(rng.random((b, s, s)) < keep)

    def loss_pallas(q, k, v, c):
        return jnp.sum(_fused(q, k, v, c, mask, m1, m2, 0.4, keep, True) ** 2)

    def loss_xla(q, k, v, c):
        return jnp.sum(
            _xla_forward(
                q, k, v, c, mask, m1, m2, beta=0.4, keep=keep, use_dropout=True
            )
            ** 2
        )

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, c)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, c)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
        )


def test_dropout_preserves_expectation():
    q, k, v, c, mask = _inputs(b=64, seed=2)
    outs = []
    for i in range(20):
        out = dual_attention_pallas(
            q, k, v, c, mask, 0.5, 0.3, False, jax.random.key(i)
        )
        outs.append(np.asarray(out))
    mean = np.mean(outs, axis=0)
    ref = np.asarray(dual_attention_pallas(q, k, v, c, mask, 0.5, 0.0, True, None))
    # dropout is unbiased → the average approaches the deterministic output
    assert np.abs(mean - ref).mean() < 0.15


def test_unpadded_batch_not_multiple_of_block():
    # batch smaller than BLOCK_B exercises the padding path
    q, k, v, c, mask = _inputs(b=3, seed=3)
    a = dual_attention_xla(q, k, v, c, mask, 0.5, 0.0, True, None)
    b = dual_attention_pallas(q, k, v, c, mask, 0.5, 0.0, True, None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_model_with_pallas_attention():
    """Full PMGT forward with attention_impl='pallas' matches 'xla'."""
    from pmgt_tpu.core.config import PMGTConfig
    from pmgt_tpu.models.pmgt import PMGTForPreTraining
    from pmgt_tpu.sampling.pairs import PretrainBatch

    rng = np.random.default_rng(4)
    batch = PretrainBatch(
        target_ids=jnp.asarray(rng.integers(2, 10, (4, 4)), jnp.int32),
        target_mask=jnp.ones((4, 4), jnp.float32),
        pair_ids=jnp.asarray(rng.integers(2, 10, (4, 3, 4)), jnp.int32),
        pair_mask=jnp.ones((4, 3, 4), jnp.float32),
        labels=jnp.asarray(rng.integers(0, 2, (4, 3)).astype(np.float32)),
        pair_valid=jnp.ones((4, 3), jnp.float32),
    )
    tables = [
        jnp.asarray(rng.normal(size=(12, f)).astype(np.float32))
        for f in (12, 8)
    ]
    outs = {}
    for impl in ("xla", "pallas"):
        cfg = PMGTConfig(
            hidden_size=16,
            intermediate_size=16,
            num_hidden_layers=2,
            num_attention_heads=2,
            feat_hidden_sizes=(12, 8),
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            attention_impl=impl,
        )
        model = PMGTForPreTraining(config=cfg, node_size=10)
        params = model.init(
            {"params": jax.random.key(0)},
            tables,
            batch,
            deterministic=True,
            compute_nfr=False,
        )
        out = model.apply(
            params, tables, batch, deterministic=True, compute_nfr=False
        )
        outs[impl] = float(out.loss)
    assert outs["xla"] == pytest.approx(outs["pallas"], rel=1e-5)


# ----------------------------------------------------------------------
# Seq-major kernels ([S, N, d] layout — the model's default TPU path)
# ----------------------------------------------------------------------

def _sm_inputs(n=10, s=6, d=16, seed=3):
    rng = np.random.default_rng(seed)
    q, k, v, c = (
        jnp.asarray(rng.normal(size=(s, n, d)).astype(np.float32))
        for _ in range(4)
    )
    mask = np.zeros((n, s), np.float32)
    mask[:, s - 1:] = np.finfo(np.float32).min
    return q, k, v, c, jnp.asarray(mask)


def _xla_from_sm(q, k, v, c, mask_bs, beta):
    """Reference: run dual_attention_xla on the transposed inputs."""
    to_bm = lambda x: jnp.transpose(x, (1, 0, 2))[:, None]  # [N,1,S,d]
    out = dual_attention_xla(
        to_bm(q), to_bm(k), to_bm(v), to_bm(c),
        mask_bs[:, None, None, :], beta, 0.0, True, None,
    )  # [N, 1, S, d]
    return jnp.transpose(out[:, 0], (1, 0, 2))  # [S, N, d]


@pytest.mark.parametrize("beta", [0.0, 0.5, 1.0])
def test_sm_forward_matches_xla(beta):
    from pmgt_tpu.ops.dual_attention import dual_attention_pallas_sm

    q, k, v, c, mask = _sm_inputs()
    a = _xla_from_sm(q, k, v, c, mask, beta)
    b = dual_attention_pallas_sm(q, k, v, c, mask, beta, 0.0, True, None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_sm_gradients_match_xla():
    from pmgt_tpu.ops.dual_attention import dual_attention_pallas_sm

    q, k, v, c, mask = _sm_inputs(seed=4)

    def loss_x(q, k, v, c):
        return jnp.sum(_xla_from_sm(q, k, v, c, mask, 0.3) ** 2)

    def loss_p(q, k, v, c):
        return jnp.sum(
            dual_attention_pallas_sm(q, k, v, c, mask, 0.3, 0.0, True, None)
            ** 2
        )

    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(q, k, v, c)
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, c)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_sm_dropout_preserves_expectation():
    from pmgt_tpu.ops.dual_attention import dual_attention_pallas_sm

    q, k, v, c, mask = _sm_inputs(n=32, seed=6)
    det = dual_attention_pallas_sm(q, k, v, c, mask, 0.5, 0.0, True, None)
    outs = []
    for i in range(120):
        outs.append(
            dual_attention_pallas_sm(
                q, k, v, c, mask, 0.5, 0.3, False, jax.random.key(i)
            )
        )
    mean = np.mean([np.asarray(o) for o in outs], axis=0)
    np.testing.assert_allclose(mean, np.asarray(det), atol=0.15)


def test_sm_unpadded_n_not_multiple_of_block():
    from pmgt_tpu.ops.dual_attention import dual_attention_pallas_sm

    q, k, v, c, mask = _sm_inputs(n=37, seed=7)
    out = dual_attention_pallas_sm(q, k, v, c, mask, 0.4, 0.0, True, None)
    ref = _xla_from_sm(q, k, v, c, mask, 0.4)
    assert out.shape == (6, 37, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
