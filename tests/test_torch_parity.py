"""Full-model numerical parity: torch reference semantics vs the Flax build.

Ports identical weights between the from-scratch torch PMGT
(pmgt_tpu/bench/torch_reference.py — written to the reference's math,
pmgt/pmgt/modeling_pmgt.py:65-534) and ``PMGTForPreTraining``, then asserts
matching encoder hidden states, GSR logits/loss, and NFR loss on identical
node-id sequences. Same pattern for NCF (ncf/models.py:14-154) and DCN
(dcn/models.py:40-183) forward passes. This converts "behavioral parity"
from prose into an invariant: if any layer's math drifts from the
reference semantics, these tests fail.

Everything runs with dropout disabled (torch .eval() / flax
deterministic=True) in float32 on CPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from pmgt_tpu.bench.torch_reference import TorchPMGT
from pmgt_tpu.core.config import PMGTConfig
from pmgt_tpu.models.pmgt import PMGTForPreTraining
from pmgt_tpu.sampling.pairs import PretrainBatch

ATOL = 2e-5


def _t2n(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy()


def _lin(mod: nn.Linear) -> dict:
    # torch Linear weight is [out, in]; flax Dense kernel is [in, out].
    return {"kernel": _t2n(mod.weight).T, "bias": _t2n(mod.bias)}


def _ln(mod: nn.LayerNorm) -> dict:
    return {"scale": _t2n(mod.weight), "bias": _t2n(mod.bias)}


# ----------------------------------------------------------------------
# PMGT
# ----------------------------------------------------------------------

NODE_SIZE = 40
FEAT_DIMS = (12, 8)
HIDDEN, INTER, LAYERS, HEADS = 16, 24, 2, 2
SEQ = 6  # 1 + max_ctx_neigh


@pytest.fixture(scope="module")
def pmgt_pair():
    """(torch model in eval mode, flax model, flax params, feat tables)."""
    torch.manual_seed(0)
    tmodel = TorchPMGT(
        NODE_SIZE,
        list(FEAT_DIMS),
        hidden=HIDDEN,
        inter=INTER,
        layers=LAYERS,
        heads=HEADS,
        beta=0.5,
        dropout=0.1,  # inert: eval mode / deterministic
    ).eval()

    rs = np.random.RandomState(1)
    tables = [
        rs.normal(size=(NODE_SIZE + 2, f)).astype(np.float32) for f in FEAT_DIMS
    ]
    for t in tables:
        t[0] = 0.0  # <pad> row
    for table, w in zip(tmodel.tables, tables):
        with torch.no_grad():
            table.weight.copy_(torch.from_numpy(w))

    cfg = PMGTConfig(
        hidden_size=HIDDEN,
        feat_hidden_sizes=FEAT_DIMS,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        beta=0.5,
        attention_impl="xla",
    )
    fmodel = PMGTForPreTraining(config=cfg, node_size=NODE_SIZE)

    emb = {
        "feat_linear_0": _lin(tmodel.proj[0]),
        "feat_linear_1": _lin(tmodel.proj[1]),
        "modality_attention": _lin(tmodel.mod_attn),
        "position_embeddings": _t2n(tmodel.pos.weight),
        "role_embeddings": _t2n(tmodel.role.weight),
        "norm": _ln(tmodel.ln),
    }
    layers = {}
    for i, tl in enumerate(tmodel.layers):
        layers[f"layer_{i}"] = {
            "self_attention": {
                "query": _lin(tl.attn.q),
                "key": _lin(tl.attn.k),
                "value": _lin(tl.attn.v),
                "ctx_attention": _lin(tl.attn.c),
            },
            "attention_output": _lin(tl.attn_out),
            "attention_norm": _ln(tl.ln1),
            "intermediate": _lin(tl.ff1),
            "output": _lin(tl.ff2),
            "output_norm": _ln(tl.ln2),
        }
    params = {
        "bert": {"embeddings": emb, **layers},
        **{
            f"nfr_projection_{i}": _lin(tmodel.nfr_proj[i])
            for i in range(len(FEAT_DIMS))
        },
    }
    params = jax.tree.map(jnp.asarray, params)
    return tmodel, fmodel, params, tables


def _random_sequences(rs, batch):
    """[B, SEQ] node ids (1s-then-0s padding) + matching attention mask."""
    ids = rs.randint(2, NODE_SIZE + 2, size=(batch, SEQ)).astype(np.int32)
    mask = np.ones((batch, SEQ), np.float32)
    for b in range(batch):
        nc = rs.randint(0, SEQ)  # number of context slots kept
        ids[b, 1 + nc :] = 0
        mask[b, 1 + nc :] = 0.0
    return ids, mask


def test_pmgt_encoder_hidden_states_match(pmgt_pair):
    tmodel, fmodel, params, tables = pmgt_pair
    rs = np.random.RandomState(2)
    ids, mask = _random_sequences(rs, batch=7)

    with torch.no_grad():
        t_out = tmodel.encode(
            torch.from_numpy(ids.astype(np.int64)), torch.from_numpy(mask)
        )
    f_out = fmodel.apply(
        {"params": params},
        [jnp.asarray(t) for t in tables],
        jnp.asarray(ids),
        jnp.asarray(mask),
        deterministic=True,
        method=PMGTForPreTraining.encode,
    )
    np.testing.assert_allclose(np.asarray(f_out), _t2n(t_out), atol=ATOL)


def test_pmgt_gsr_loss_and_logits_match(pmgt_pair):
    tmodel, fmodel, params, tables = pmgt_pair
    rs = np.random.RandomState(3)
    b, p = 5, 4
    t_ids, t_mask = _random_sequences(rs, b)
    pair_ids, pair_mask = _random_sequences(rs, b * p)
    labels = (rs.rand(b, p) < 0.5).astype(np.float32)

    batch = PretrainBatch(
        target_ids=jnp.asarray(t_ids),
        target_mask=jnp.asarray(t_mask),
        pair_ids=jnp.asarray(pair_ids.reshape(b, p, SEQ)),
        pair_mask=jnp.asarray(pair_mask.reshape(b, p, SEQ)),
        labels=jnp.asarray(labels),
        pair_valid=jnp.ones((b, p), jnp.float32),
    )
    out = fmodel.apply(
        {"params": params},
        [jnp.asarray(t) for t in tables],
        batch,
        deterministic=True,
        compute_nfr=False,
    )

    # Torch side: the reference's per-sample loop of encoder passes +
    # mean-of-per-sample-means BCE (reference models.py:104-127).
    with torch.no_grad():
        t_hidden = tmodel.encode(
            torch.from_numpy(t_ids.astype(np.int64)), torch.from_numpy(t_mask)
        )
        losses, logit_rows = [], []
        for i in range(b):
            ph = tmodel.encode(
                torch.from_numpy(
                    pair_ids.reshape(b, p, SEQ)[i].astype(np.int64)
                ),
                torch.from_numpy(pair_mask.reshape(b, p, SEQ)[i]),
            )[:, 0]
            tcls = F.normalize(t_hidden[i, 0], dim=-1)
            pcls = F.normalize(ph, dim=-1)
            logits = pcls @ tcls
            logit_rows.append(logits)
            losses.append(
                F.binary_cross_entropy_with_logits(
                    logits, torch.from_numpy(labels[i])
                )
            )
        t_gsr = torch.stack(losses).mean()
        t_logits = torch.stack(logit_rows)

    np.testing.assert_allclose(
        np.asarray(out.logits), _t2n(t_logits), atol=ATOL
    )
    np.testing.assert_allclose(
        float(out.gsr_loss), float(t_gsr), atol=ATOL
    )


def test_pmgt_nfr_loss_matches(pmgt_pair):
    tmodel, fmodel, params, tables = pmgt_pair
    rs = np.random.RandomState(4)
    ids, mask = _random_sequences(rs, batch=6)

    # Deterministic corruption: mask context slots on a fixed pattern.
    ctx = ids[:, 1:]
    masked_pos = (((np.arange(SEQ - 1)[None, :] + np.arange(6)[:, None]) % 3) == 0) & (
        ctx != 0
    )
    masked_ids = ids.copy()
    masked_ids[:, 1:][masked_pos] = 1  # <mask>

    jt = [jnp.asarray(t) for t in tables]
    masked_hidden = fmodel.apply(
        {"params": params},
        jt,
        jnp.asarray(masked_ids),
        jnp.asarray(mask),
        deterministic=True,
        method=PMGTForPreTraining.encode,
    )
    f_nfr = fmodel.apply(
        {"params": params},
        jt,
        masked_hidden,
        jnp.asarray(masked_pos.astype(np.float32)),
        jnp.asarray(ctx),
        method=PMGTForPreTraining._nfr_loss,
    )

    with torch.no_grad():
        mh = tmodel.encode(
            torch.from_numpy(masked_ids.astype(np.int64)),
            torch.from_numpy(mask),
        )[:, 1:][torch.from_numpy(masked_pos)]
        tgt = torch.from_numpy(ctx.astype(np.int64))[
            torch.from_numpy(masked_pos)
        ]
        t_nfr = torch.stack(
            [
                F.mse_loss(proj(mh), table(tgt))
                for proj, table in zip(tmodel.nfr_proj, tmodel.tables)
            ]
        ).mean()

    np.testing.assert_allclose(float(f_nfr), float(t_nfr), atol=ATOL)


# ----------------------------------------------------------------------
# NCF (reference ncf/models.py:14-154 semantics)
# ----------------------------------------------------------------------

class TorchNCF(nn.Module):
    """Reference-semantics NCF: GMF element product, halving-width MLP
    tower on concatenated user/item embeddings, concat -> predict."""

    def __init__(self, users, items, fn, nl, variant):
        super().__init__()
        self.variant = variant
        mlp_dim = fn * (2 ** (nl - 1))
        if variant != "MLP":
            self.embed_user_GMF = nn.Embedding(users, fn)
            self.embed_item_GMF = nn.Embedding(items, fn)
        if variant != "GMF":
            self.embed_user_MLP = nn.Embedding(users, mlp_dim)
            self.embed_item_MLP = nn.Embedding(items, mlp_dim)
            self.tower = nn.ModuleList(
                nn.Linear(fn * (2 ** (nl - i)), fn * (2 ** (nl - i)) // 2)
                for i in range(nl)
            )
        pred = fn if variant in ("GMF", "MLP") else fn * 2
        self.predict = nn.Linear(pred, 1)

    def forward(self, user, item):
        outs = []
        if self.variant != "MLP":
            outs.append(self.embed_user_GMF(user) * self.embed_item_GMF(item))
        if self.variant != "GMF":
            x = torch.cat(
                [self.embed_user_MLP(user), self.embed_item_MLP(item)], -1
            )
            for layer in self.tower:
                x = torch.relu(layer(x))
            outs.append(x)
        return self.predict(torch.cat(outs, -1)).squeeze(-1)


@pytest.mark.parametrize("variant", ["GMF", "MLP", "NeuMF-end"])
def test_ncf_forward_parity(variant):
    from pmgt_tpu.models.ncf import NCF

    users, items, fn, nl = 13, 17, 4, 3
    torch.manual_seed(5)
    tm = TorchNCF(users, items, fn, nl, variant).eval()
    fm = NCF(
        user_num=users, item_num=items, factor_num=fn, num_layers=nl,
        model=variant,
    )

    params = {"predict_layer": _lin(tm.predict)}
    if variant != "MLP":
        params["embed_user_GMF"] = {"embedding": _t2n(tm.embed_user_GMF.weight)}
        params["embed_item_GMF"] = {"embedding": _t2n(tm.embed_item_GMF.weight)}
    if variant != "GMF":
        params["embed_user_MLP"] = {"embedding": _t2n(tm.embed_user_MLP.weight)}
        params["embed_item_MLP"] = {"embedding": _t2n(tm.embed_item_MLP.weight)}
        for i, layer in enumerate(tm.tower):
            params[f"mlp_{i}"] = _lin(layer)
    params = jax.tree.map(jnp.asarray, params)

    rs = np.random.RandomState(6)
    u = rs.randint(0, users, size=32).astype(np.int32)
    it = rs.randint(0, items, size=32).astype(np.int32)
    f_logits = fm.apply(
        {"params": params}, jnp.asarray(u), jnp.asarray(it)
    )
    with torch.no_grad():
        t_logits = tm(
            torch.from_numpy(u.astype(np.int64)),
            torch.from_numpy(it.astype(np.int64)),
        )
    np.testing.assert_allclose(np.asarray(f_logits), _t2n(t_logits), atol=ATOL)


# ----------------------------------------------------------------------
# DCN (reference dcn/models.py:40-183 semantics)
# ----------------------------------------------------------------------

class TorchDCN(nn.Module):
    """Reference-semantics DCN with the *materialized* outer-product cross
    (x0 x1ᵀ) w + x0 — the algebraic form the Flax build computes as
    x0 * (x1·w) — and the reference's unused cross bias quirk."""

    def __init__(self, users, items, fn, deep_layers, cross_layers):
        super().__init__()
        input_size = fn * (2 ** deep_layers)
        self.embed_user = nn.Embedding(users, input_size)
        self.embed_item = nn.Embedding(items, input_size)
        self.cross_w = nn.ParameterList(
            nn.Parameter(torch.randn(2 * input_size, 1))
            for _ in range(cross_layers)
        )
        sizes = [fn * (2 ** (deep_layers + 1 - i)) for i in range(1, deep_layers + 1)]
        deep, prev = [], 2 * input_size
        for s in sizes:
            deep.append(nn.Linear(prev, s))
            prev = s
        self.deep = nn.ModuleList(deep)
        self.out = nn.Linear(2 * input_size + prev, 1)

    def forward(self, user, item):
        x0 = torch.cat([self.embed_user(user), self.embed_item(item)], -1)
        x1 = x0
        for w in self.cross_w:
            outer = torch.bmm(x0.unsqueeze(2), x1.unsqueeze(1))  # [B, H, H]
            # residual is +x0 and the bias is created-but-unused — both
            # reference quirks (dcn/models.py:64-69)
            x1 = (outer @ w).squeeze(-1) + x0
        d = x0
        for layer in self.deep:
            d = torch.relu(layer(d))
        return self.out(torch.cat([x1, d], -1)).squeeze(-1)


def test_dcn_forward_parity():
    from pmgt_tpu.models.dcn import DCN

    users, items, fn, dl, cl = 11, 19, 2, 3, 2
    torch.manual_seed(7)
    tm = TorchDCN(users, items, fn, dl, cl).eval()
    fm = DCN(
        user_num=users, item_num=items, factor_num=fn,
        deep_net_num_layers=dl, cross_net_num_layers=cl,
    )

    params = {
        "user_embeddings": {"embedding": _t2n(tm.embed_user.weight)},
        "item_embeddings": {"embedding": _t2n(tm.embed_item.weight)},
        "cross_net": {
            f"cross_{i}": {"weight": _t2n(tm.cross_w[i])}
            for i in range(cl)
        },
        "deep_net": {
            f"deep_{i}": _lin(tm.deep[i]) for i in range(dl)
        },
        "output_layer": _lin(tm.out),
    }
    params = jax.tree.map(jnp.asarray, params)

    rs = np.random.RandomState(8)
    u = rs.randint(0, users, size=32).astype(np.int32)
    it = rs.randint(0, items, size=32).astype(np.int32)
    f_logits = fm.apply({"params": params}, jnp.asarray(u), jnp.asarray(it))
    with torch.no_grad():
        t_logits = tm(
            torch.from_numpy(u.astype(np.int64)),
            torch.from_numpy(it.astype(np.int64)),
        )
    np.testing.assert_allclose(np.asarray(f_logits), _t2n(t_logits), atol=ATOL)


# ----------------------------------------------------------------------
# Encoder introspection parity: per-layer hidden states, attention probs,
# head_mask threading (reference modeling_pmgt.py:222-267, 460-461,
# 516-517, 526-531)
# ----------------------------------------------------------------------

def _flax_encoder_outputs(pmgt_pair_vals, ids, mask, head_mask=None):
    from pmgt_tpu.models.pmgt import PMGTModel

    tmodel, fmodel, params, tables = pmgt_pair_vals
    bert = PMGTModel(config=fmodel.config)
    feats = [jnp.asarray(t)[jnp.asarray(ids)] for t in tables]
    return bert.apply(
        {"params": params["bert"]},
        feats,
        jnp.asarray(mask),
        deterministic=True,
        head_mask=None if head_mask is None else jnp.asarray(head_mask),
        output_hidden_states=True,
        output_attentions=True,
    )


def test_pmgt_per_layer_hidden_states_and_attentions_match(pmgt_pair):
    tmodel, fmodel, params, tables = pmgt_pair
    rs = np.random.RandomState(11)
    ids, mask = _random_sequences(rs, batch=5)

    with torch.no_grad():
        _, t_hidden, t_probs = tmodel.encode(
            torch.from_numpy(ids.astype(np.int64)),
            torch.from_numpy(mask),
            output_hidden_states=True,
            output_attentions=True,
        )
    last, pooled, aux = _flax_encoder_outputs(pmgt_pair, ids, mask)
    f_hidden = aux["hidden_states"]
    f_probs = aux["attentions"]

    assert len(f_hidden) == LAYERS + 1  # embeddings output + every layer
    assert len(f_probs) == LAYERS
    for th, fh in zip(t_hidden, f_hidden):
        np.testing.assert_allclose(np.asarray(fh), _t2n(th), atol=ATOL)
    for tp, fp in zip(t_probs, f_probs):
        assert fp.shape == (5, HEADS, SEQ, SEQ)
        np.testing.assert_allclose(np.asarray(fp), _t2n(tp), atol=ATOL)
    # last_hidden_state == final entry of hidden_states
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(f_hidden[-1]), atol=1e-7
    )
    # attention probs rows over valid positions sum to 1 (two blended
    # distributions, each row-stochastic)
    row_sums = np.asarray(f_probs[0]).sum(-1)
    np.testing.assert_allclose(row_sums, np.ones_like(row_sums), atol=1e-5)


def test_pmgt_head_mask_parity_and_effect(pmgt_pair):
    tmodel, fmodel, params, tables = pmgt_pair
    rs = np.random.RandomState(12)
    ids, mask = _random_sequences(rs, batch=4)

    head_mask = np.ones((LAYERS, HEADS), np.float32)
    head_mask[0, 0] = 0.0  # silence head 0 of layer 0
    with torch.no_grad():
        t_out, _, _ = tmodel.encode(
            torch.from_numpy(ids.astype(np.int64)),
            torch.from_numpy(mask),
            head_mask=torch.from_numpy(head_mask),
            output_hidden_states=True,
        )
    last, _, aux = _flax_encoder_outputs(pmgt_pair, ids, mask, head_mask)
    np.testing.assert_allclose(np.asarray(last), _t2n(t_out), atol=ATOL)

    # and the mask has a real effect vs the unmasked pass
    unmasked, _, _ = _flax_encoder_outputs(pmgt_pair, ids, mask)
    assert np.abs(np.asarray(last) - np.asarray(unmasked)).max() > 1e-4
