"""PMGT encoder and pretraining model (JAX/Flax).

Behavioral reference: pmgt/pmgt/modeling_pmgt.py and pmgt/pmgt/models.py.
Re-designed for TPU:

- One fused forward: target pass, pair pass, and the NFR masked pass run as
  a single batched encoder invocation instead of the reference's per-sample
  Python loop of encoder calls (reference models.py:104-127).
- Pairs are dense [B, P, S] with a validity mask; the GSR loss reproduces
  the reference's mean-over-samples-of-mean-over-pairs semantics
  (models.py:119-125) via masked means.
- The dual-attention core (diversity-promoting + standard attention blended
  by beta, reference modeling_pmgt.py:420-534) is swappable:
  ``config.attention_impl in {"xla", "pallas"}``.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pmgt_tpu.core.config import PMGTConfig
from pmgt_tpu.core.quant import dense_table, table_rows
from pmgt_tpu.graph.container import NUM_SPECIAL_NODES
from pmgt_tpu.sampling.pairs import PretrainBatch

Array = jax.Array

# Matches HF's get_extended_attention_mask: (1 - mask) * finfo(dtype).min.
# A large finite negative keeps bf16 softmax well-behaved.
def _additive_mask(attention_mask: Array, dtype) -> Array:
    big_neg = jnp.finfo(dtype).min
    return ((1.0 - attention_mask) * big_neg).astype(dtype)


def lookup_rows(
    feat_tables: Sequence[Array], ids: Array, dtype=None
) -> List[Array]:
    """Per-modality raw feature-row lookup (reference
    pmgt/pmgt/utils.py:43-50) — the gather_rows dataflow's table read,
    shared by the pretrain encoder and the PMGT_NCF head. Accepts plain
    or int8 row-quantized tables (core/quant.py); pass the compute dtype
    so quantized rows dequantize without an f32 detour."""
    return [table_rows(t, ids, dtype) for t in feat_tables]


def _normal_init(std: float):
    return nn.initializers.normal(stddev=std)


class PMGTEmbeddings(nn.Module):
    """Multimodal fusion + position/role embeddings
    (reference modeling_pmgt.py:155-210).

    Per-modality linear projection to hidden size, softmax attention over
    modalities, plus learned absolute-position embeddings and role
    embeddings (role 0 = target node, role 1 = context node).

    TPU optimization: ``project`` applies the per-modality projections to
    the **whole frozen feature table** as one MXU matmul; callers then
    gather compact [N+2, H] rows instead of [.., 1536/768] raw features —
    ~17x less gather bandwidth on the training hot path. ``__call__`` with
    ``projected=True`` consumes such pre-projected inputs. The math is
    identical (gather and linear projection commute).
    """

    config: PMGTConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        self.feat_linear = [
            nn.Dense(
                cfg.hidden_size,
                kernel_init=_normal_init(cfg.initializer_range),
                dtype=dtype,
                name=f"feat_linear_{i}",
            )
            for i in range(cfg.num_feats)
        ]
        self.modality_attention = nn.Dense(
            cfg.num_feats,
            kernel_init=_normal_init(cfg.initializer_range),
            dtype=dtype,
            name="modality_attention",
        )
        self.position_embeddings = self.param(
            "position_embeddings",
            _normal_init(cfg.initializer_range),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        self.role_embeddings = self.param(
            "role_embeddings",
            _normal_init(cfg.initializer_range),
            (2, cfg.hidden_size),
        )
        self.norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype)
        self.drop = nn.Dropout(cfg.hidden_dropout_prob)

    def project(self, feat_tables: Sequence[Array]) -> List[Array]:
        """Project full per-modality tables to hidden size: [N+2, F] →
        [N+2, H] (one big MXU matmul per modality)."""
        dtype = jnp.dtype(self.config.dtype)
        return [
            dense(dense_table(t, dtype))
            for dense, t in zip(self.feat_linear, feat_tables)
        ]

    def __call__(
        self,
        feat_embeds: Sequence[Array],
        deterministic: bool = True,
        projected: bool = False,
    ) -> Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        seq_len = feat_embeds[0].shape[1]

        if projected:
            proj = [x.astype(dtype) for x in feat_embeds]
        else:
            proj = [
                dense(x.astype(dtype))
                for dense, x in zip(self.feat_linear, feat_embeds)
            ]
        concat = jnp.concatenate(proj, axis=-1)
        # Modality attention: tanh -> Dense(num_feats) -> softmax
        # (reference modeling_pmgt.py:169-173).
        scores = jax.nn.softmax(
            self.modality_attention(jnp.tanh(concat)), axis=-1
        )
        stacked = jnp.stack(proj, axis=2)  # [B, S, M, H]
        fused = jnp.sum(scores[..., None] * stacked, axis=2)

        # role 0 for the target (position 0), role 1 for every context slot
        # (reference modeling_pmgt.py:182-187).
        pos = self.position_embeddings[:seq_len].astype(dtype)
        role_ids = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.ones((seq_len - 1,), jnp.int32)]
        )
        role = self.role_embeddings[role_ids].astype(dtype)

        embeds = fused + pos[None, :, :] + role[None, :, :]
        embeds = self.norm(embeds)
        embeds = self.drop(embeds, deterministic=deterministic)
        return embeds


def dual_attention_xla(
    query: Array,
    key: Array,
    value: Array,
    ctx: Array,
    additive_mask: Optional[Array],
    beta: float,
    dropout_rate: float,
    deterministic: bool,
    dropout_rng: Optional[Array],
    scores2_bias: Optional[Array] = None,
    head_mask: Optional[Array] = None,
    return_probs: bool = False,
):
    """Reference XLA implementation of the dual-attention core.

    Inputs are [B, h, S, d]. Two attention distributions are blended:
    P1 = softmax(1 - cosine_sim(ctx, ctx) + I) pushes attention toward
    *dissimilar* neighbors (reference modeling_pmgt.py:435-458); P2 is
    standard scaled dot-product attention (modeling_pmgt.py:464-513).
    Output = (beta * P1 + (1 - beta) * P2) @ V.

    ``head_mask`` multiplies both prob matrices after dropout (reference
    modeling_pmgt.py:460-461, 516-517); with ``return_probs`` the blended
    probs are returned alongside the output (the reference's
    ``output_attentions`` payload, modeling_pmgt.py:526-531).
    """
    b, h, s, d = query.shape
    dtype = query.dtype

    # Diversity-promoting scores.
    ctx_norm = jnp.linalg.norm(ctx, axis=-1, keepdims=True)  # [B,h,S,1]
    norm_outer = jnp.einsum("bhid,bhjd->bhij", ctx_norm, ctx_norm)
    cos = jnp.einsum("bhid,bhjd->bhij", ctx, ctx) / jnp.maximum(
        norm_outer, jnp.asarray(1e-12, dtype)
    )
    eye = jnp.eye(s, dtype=dtype)
    scores1 = 1.0 - cos + eye[None, None]
    if additive_mask is not None:
        scores1 = scores1 + additive_mask
    probs1 = jax.nn.softmax(scores1, axis=-1)

    # Standard scaled dot-product scores (+ optional relative-position
    # bias, which only affects this distribution, not the diversity one).
    scores2 = jnp.einsum("bhid,bhjd->bhij", query, key) / jnp.sqrt(
        jnp.asarray(d, dtype)
    )
    if scores2_bias is not None:
        scores2 = scores2 + scores2_bias
    if additive_mask is not None:
        scores2 = scores2 + additive_mask
    probs2 = jax.nn.softmax(scores2, axis=-1)

    if not deterministic and dropout_rate > 0.0:
        rng1, rng2 = jax.random.split(dropout_rng)
        keep = 1.0 - dropout_rate
        m1 = jax.random.bernoulli(rng1, keep, probs1.shape)
        m2 = jax.random.bernoulli(rng2, keep, probs2.shape)
        probs1 = jnp.where(m1, probs1 / keep, 0.0).astype(dtype)
        probs2 = jnp.where(m2, probs2 / keep, 0.0).astype(dtype)

    if head_mask is not None:
        # [h] (or broadcastable) per-head scaling, post-dropout.
        hm = jnp.asarray(head_mask, dtype)
        if hm.ndim == 1:
            hm = hm[None, :, None, None]
        probs1 = probs1 * hm
        probs2 = probs2 * hm

    probs = beta * probs1 + (1.0 - beta) * probs2
    out = jnp.einsum("bhij,bhjd->bhid", probs, value)
    if return_probs:
        return out, probs
    return out


class PMGTSelfAttention(nn.Module):
    """Dual self-attention (reference modeling_pmgt.py:378-534)."""

    config: PMGTConfig

    @nn.compact
    def __call__(
        self,
        hidden_sm: Array,  # [S, B, H] seq-major (see PMGTModel)
        masks,  # (additive_4d [B,1,1,S], additive_bs [B,S])
        deterministic: bool = True,
        head_mask: Optional[Array] = None,
        output_attentions: bool = False,
    ) -> Tuple[Array, Optional[Array]]:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        s, b, _ = hidden_sm.shape
        h, d = cfg.num_attention_heads, cfg.head_dim
        additive_4d, additive_bs = masks

        flat = hidden_sm.reshape(s * b, hidden_sm.shape[-1])

        def proj(name):
            # [S*B, all_head] — rows stay seq-major; the [S, B*h, d] view
            # below is a free leading-dim split (no relayout)
            return nn.Dense(
                cfg.all_head_size,
                kernel_init=_normal_init(cfg.initializer_range),
                dtype=dtype,
                name=name,
            )(flat)

        query = proj("query")
        key = proj("key")
        value = proj("value")
        ctx = proj("ctx_attention")

        dropout_rng = None
        if not deterministic and cfg.attention_probs_dropout_prob > 0.0:
            dropout_rng = self.make_rng("dropout")

        # Relative-position score terms (reference modeling_pmgt.py:466-501):
        # rel[i, j] = q_i . E_{i-j} (+ k_j . E_{i-j} for the "_query"
        # variant). They bias only the standard qk distribution, never the
        # diversity one. The reference adds them to the raw qk scores
        # *before* the 1/sqrt(d) scaling (modeling_pmgt.py:489-503); our
        # backends scale first, so pre-divide here.
        scores2_bias = None
        if cfg.position_embedding_type in ("relative_key", "relative_key_query"):
            distance_emb = self.param(
                "distance_embedding",
                _normal_init(cfg.initializer_range),
                (2 * cfg.max_position_embeddings - 1, d),
            ).astype(dtype)
            pos = jnp.arange(s)
            distance = pos[:, None] - pos[None, :]
            rel = distance_emb[distance + cfg.max_position_embeddings - 1]
            # query/key are flat seq-major [S*B, h*d]; view as [S, B, h, d]
            # (l/r = query/key position) for the relative-score einsums.
            q_sm = query.reshape(s, b, h, d)
            rel_scores = jnp.einsum("lbhd,lrd->bhlr", q_sm, rel)
            if cfg.position_embedding_type == "relative_key_query":
                k_sm = key.reshape(s, b, h, d)
                rel_scores = rel_scores + jnp.einsum(
                    "rbhd,lrd->bhlr", k_sm, rel
                )
            scores2_bias = rel_scores / jnp.sqrt(jnp.asarray(d, dtype))

        # The Pallas kernel covers the absolute-position configuration;
        # relative-position variants and introspection requests
        # (head_mask / output_attentions, reference
        # modeling_pmgt.py:460-461, 526-531) take the XLA path.
        probs = None
        if (
            cfg.attention_impl == "pallas"
            and scores2_bias is None
            and head_mask is None
            and not output_attentions
        ):
            from pmgt_tpu.ops.dual_attention import dual_attention_pallas_sm

            fold = lambda x: x.reshape(s, b * h, d)  # noqa: E731 free view
            mask_nb = jnp.broadcast_to(
                additive_bs[:, None, :], (b, h, s)
            ).reshape(b * h, s)
            out = dual_attention_pallas_sm(
                fold(query),
                fold(key),
                fold(value),
                fold(ctx),
                mask_nb,
                beta=cfg.beta,
                dropout_rate=cfg.attention_probs_dropout_prob,
                deterministic=deterministic,
                dropout_rng=dropout_rng,
            )
            out = out.reshape(s, b, cfg.all_head_size)
        else:
            to_bm = lambda x: x.reshape(s, b, h, d).transpose(1, 2, 0, 3)  # noqa: E731
            out = dual_attention_xla(
                to_bm(query),
                to_bm(key),
                to_bm(value),
                to_bm(ctx),
                additive_4d,
                beta=cfg.beta,
                dropout_rate=cfg.attention_probs_dropout_prob,
                deterministic=deterministic,
                dropout_rng=dropout_rng,
                scores2_bias=scores2_bias,
                head_mask=head_mask,
                return_probs=output_attentions,
            )
            if output_attentions:
                out, probs = out
            # [B, h, S, d] -> [S, B, h*d]
            out = out.transpose(2, 0, 1, 3).reshape(s, b, cfg.all_head_size)
        return out, probs


class PMGTLayer(nn.Module):
    """Transformer block: dual attention + BERT-style FFN with post-LN
    residuals (reference modeling_pmgt.py:287-325 and the HF
    BertSelfOutput/BertIntermediate/BertOutput parts it reuses)."""

    config: PMGTConfig

    @nn.compact
    def __call__(
        self,
        hidden: Array,  # [S, B, H] seq-major
        masks,  # (additive_4d, additive_bs) — see PMGTSelfAttention
        deterministic: bool = True,
        head_mask: Optional[Array] = None,
        output_attentions: bool = False,
    ) -> Tuple[Array, Optional[Array]]:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        attn, probs = PMGTSelfAttention(cfg, name="self_attention")(
            hidden, masks, deterministic, head_mask, output_attentions
        )

        # Lane packing: run the dense/LN/GELU segment on flat [S*B, H]
        # rows. The short sequence axis (S = 1 + max_ctx_neigh = 6) maps
        # to the 8-row sublane tile and wastes 25% of every elementwise
        # op in rank-3 form; flat rows tile perfectly and — because the
        # stream is seq-major — the [S, B, H] <-> [S*B, H] reshapes and
        # the attention kernel's position slices are all layout-free.
        # Parameter shapes are unchanged (Dense/LN act on the last dim).
        # NB: attn's width can differ from hidden_size under head pruning.
        s, b, _ = attn.shape
        attn = attn.reshape(s * b, attn.shape[-1])
        attn = nn.Dense(
            cfg.hidden_size,
            kernel_init=_normal_init(cfg.initializer_range),
            dtype=dtype,
            name="attention_output",
        )(attn)
        attn = nn.Dropout(cfg.hidden_dropout_prob)(
            attn, deterministic=deterministic
        )
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, name="attention_norm"
        )(attn + hidden.reshape(s * b, hidden.shape[-1]))

        inter = nn.Dense(
            cfg.intermediate_size,
            kernel_init=_normal_init(cfg.initializer_range),
            dtype=dtype,
            name="intermediate",
        )(hidden)
        # HF BERT's "gelu" is the exact erf formulation.
        inter = jax.nn.gelu(inter, approximate=False)
        out = nn.Dense(
            cfg.hidden_size,
            kernel_init=_normal_init(cfg.initializer_range),
            dtype=dtype,
            name="output",
        )(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(
            out, deterministic=deterministic
        )
        out = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, name="output_norm"
        )(out + hidden)
        return out.reshape(s, b, -1), probs


class PMGTModel(nn.Module):
    """PMGT encoder trunk (reference modeling_pmgt.py:65-152)."""

    config: PMGTConfig
    add_pooling_layer: bool = False

    def setup(self):
        cfg = self.config
        self.embeddings = PMGTEmbeddings(cfg, name="embeddings")
        # Optional per-layer rematerialization — the TPU equivalent of the
        # reference's torch gradient checkpointing plumbing
        # (modeling_pmgt.py:240-253). deterministic and output_attentions
        # are static; static_argnums counts self at position 0 for lifted
        # methods (call args: hidden=1, mask=2, deterministic=3,
        # head_mask=4, output_attentions=5).
        layer_cls = (
            nn.remat(PMGTLayer, static_argnums=(3, 5))
            if cfg.gradient_checkpointing
            else PMGTLayer
        )
        self.layers = [
            layer_cls(cfg, name=f"layer_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        if self.add_pooling_layer:
            self.pooler = nn.Dense(
                cfg.hidden_size,
                kernel_init=_normal_init(cfg.initializer_range),
                dtype=jnp.dtype(cfg.dtype),
                name="pooler",
            )

    def project_tables(self, feat_tables: Sequence[Array]) -> List[Array]:
        """Pre-project full feature tables to hidden size (see
        PMGTEmbeddings.project)."""
        return self.embeddings.project(feat_tables)

    def __call__(
        self,
        feat_embeds: Sequence[Array],
        attention_mask: Optional[Array] = None,
        deterministic: bool = True,
        projected: bool = False,
        head_mask: Optional[Array] = None,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
    ):
        """Returns ``(last_hidden_state, pooled)`` by default. With
        ``output_hidden_states``/``output_attentions`` set, returns
        ``(last_hidden_state, pooled, aux)`` where ``aux`` holds
        ``hidden_states`` (embeddings output + every layer output, the
        reference's all_hidden_states tuple, modeling_pmgt.py:231-265)
        and/or ``attentions`` (per-layer blended dual-attention probs,
        modeling_pmgt.py:526-531). ``head_mask`` is ``[num_layers, h]``
        (or ``[h]``, broadcast to all layers), multiplied into both
        attention distributions post-dropout (modeling_pmgt.py:460-461,
        516-517)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        b, s = feat_embeds[0].shape[:2]

        if attention_mask is None:
            attention_mask = jnp.ones((b, s), dtype)
        additive_bs = _additive_mask(attention_mask, dtype)  # [B, S]
        masks = (additive_bs[:, None, None, :], additive_bs)

        hidden = self.embeddings(feat_embeds, deterministic, projected)
        all_hidden = [hidden] if output_hidden_states else None
        all_attn = [] if output_attentions else None
        # The residual stream runs SEQ-MAJOR [S, B, H] through the
        # layers: position slices and the flat [S*B, H] FFN rows are
        # then layout-free views, which removes the per-layer relayout
        # copies the batch-major form paid at every Pallas-call boundary
        # (~1.25 ms/step of "data formatting" in the round-3 trace).
        # Public inputs/outputs stay batch-major [B, S, H].
        hidden = jnp.transpose(hidden, (1, 0, 2))
        for i, layer in enumerate(self.layers):
            layer_head_mask = None
            if head_mask is not None:
                hm = jnp.asarray(head_mask)
                layer_head_mask = hm[i] if hm.ndim > 1 else hm
            hidden, probs = layer(
                hidden, masks, deterministic, layer_head_mask,
                output_attentions,
            )
            if output_hidden_states:
                all_hidden.append(jnp.transpose(hidden, (1, 0, 2)))
            if output_attentions:
                all_attn.append(probs)
        hidden = jnp.transpose(hidden, (1, 0, 2))

        pooled = None
        if self.add_pooling_layer:
            pooled = jnp.tanh(self.pooler(hidden[:, 0]))
        if not (output_hidden_states or output_attentions):
            return hidden, pooled
        aux = {}
        if output_hidden_states:
            aux["hidden_states"] = tuple(all_hidden)
        if output_attentions:
            aux["attentions"] = tuple(all_attn)
        return hidden, pooled, aux


def bce_with_logits(logits: Array, labels: Array) -> Array:
    """Elementwise binary cross-entropy with logits (torch
    BCEWithLogitsLoss semantics, no reduction)."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gsr_loss_fn(
    target_cls: Array,  # [B, H]
    pair_cls: Array,  # [B, P, H]
    labels: Array,  # [B, P]
    pair_valid: Array,  # [B, P]
) -> Tuple[Array, Array]:
    """Graph Structure Reconstruction loss (reference
    modeling_pmgt.py:537-546 + the per-sample loop models.py:104-127).

    L2-normalize CLS states, dot-product logits, BCE-with-logits; mean over
    each sample's valid pairs, then mean over samples (the reference's
    mean-of-per-sample-means)."""
    t = target_cls / jnp.maximum(
        jnp.linalg.norm(target_cls, axis=-1, keepdims=True), 1e-12
    )
    p = pair_cls / jnp.maximum(
        jnp.linalg.norm(pair_cls, axis=-1, keepdims=True), 1e-12
    )
    logits = jnp.einsum("bh,bph->bp", t, p)
    per_pair = bce_with_logits(logits, labels) * pair_valid
    counts = jnp.sum(pair_valid, axis=1)
    per_sample = jnp.sum(per_pair, axis=1) / jnp.maximum(counts, 1.0)
    sample_valid = (counts > 0).astype(per_sample.dtype)
    loss = jnp.sum(per_sample * sample_valid) / jnp.maximum(
        jnp.sum(sample_valid), 1.0
    )
    return loss, logits


class PretrainOutput(NamedTuple):
    loss: Array
    gsr_loss: Array
    nfr_loss: Array
    logits: Array  # [B, P] pair logits
    target_cls: Array  # [B, H]


class PMGTForPreTraining(nn.Module):
    """PMGT with GSR + NFR pretraining heads (reference
    pmgt/pmgt/models.py:22-176).

    The frozen multimodal feature tables are **inputs**, not parameters:
    pass ``feat_tables`` (list of [N+2, F_m] arrays, rows 0/1 = <pad>/<mask>)
    to every call. This keeps them out of the optimizer state entirely —
    the TPU equivalent of the reference's ``requires_grad_(False)`` tables
    (models.py:49-54) without DenseSparseAdam machinery.
    """

    config: PMGTConfig
    node_size: int  # number of real nodes (excludes <pad>/<mask>)
    random_node_ratio: float = 0.2 * 0.1
    mask_node_ratio: float = 0.2 * 0.8

    def setup(self):
        self.bert = PMGTModel(self.config, name="bert")
        self.nfr_projections = [
            nn.Dense(
                f,
                kernel_init=_normal_init(self.config.initializer_range),
                dtype=jnp.dtype(self.config.dtype),
                name=f"nfr_projection_{i}",
            )
            for i, f in enumerate(self.config.feat_hidden_sizes)
        ]

    def encode(
        self,
        feat_tables: Sequence[Array],
        node_ids: Array,
        attention_mask: Array,
        deterministic: bool = True,
    ) -> Array:
        """Encoder pass over [B, S] node-id sequences → [B, S, H].

        fusion_strategy picks the (math-identical) dataflow: project the
        whole table then gather compact [N+2, H] rows, or gather raw
        rows and project only those — see PMGTConfig.fusion_strategy.
        """
        if self.config.fusion_strategy == "gather_rows":
            feat_embeds = lookup_rows(
                feat_tables, node_ids, jnp.dtype(self.config.dtype)
            )
            hidden, _ = self.bert(
                feat_embeds, attention_mask, deterministic, projected=False
            )
            return hidden
        proj_tables = self.bert.project_tables(feat_tables)
        feat_embeds = [t[node_ids] for t in proj_tables]
        hidden, _ = self.bert(
            feat_embeds, attention_mask, deterministic, projected=True
        )
        return hidden

    def __call__(
        self,
        feat_tables: Sequence[Array],
        batch: PretrainBatch,
        deterministic: bool = False,
        compute_nfr: bool = True,
    ) -> PretrainOutput:
        b, p, s = batch.pair_ids.shape

        # --- one fused encoder pass over target + pairs (+ masked) lanes ---
        # compute_nfr is a STATIC Python bool: eval/serving calls
        # (compute_nfr=False) build only the target+pair lanes — at the
        # eval shape (P=2) the old always-appended placeholder masked
        # lane was 25% of the encoder rows, pure discarded compute.
        # Per-row encoder math is batch-independent, so GSR outputs are
        # unchanged.
        lanes = [batch.target_ids, batch.pair_ids.reshape(b * p, s)]
        mask_lanes = [batch.target_mask, batch.pair_mask.reshape(b * p, s)]
        if compute_nfr:
            masked_ids, nfr_pos_mask, nfr_target_ids = self._corrupt(
                batch.target_ids
            )
            lanes.append(masked_ids)
            mask_lanes.append(batch.target_mask)
        all_ids = jnp.concatenate(lanes)
        all_mask = jnp.concatenate(mask_lanes)
        hidden = self.encode(feat_tables, all_ids, all_mask, deterministic)

        target_hidden = hidden[:b]
        pair_cls = hidden[b : b + b * p, 0].reshape(b, p, -1)

        gsr, logits = gsr_loss_fn(
            target_hidden[:, 0], pair_cls, batch.labels, batch.pair_valid
        )

        if compute_nfr:
            masked_hidden = hidden[b + b * p :]
            nfr = self._nfr_loss(
                feat_tables, masked_hidden, nfr_pos_mask, nfr_target_ids
            )
        else:
            nfr = jnp.asarray(0.0, gsr.dtype)

        return PretrainOutput(
            loss=gsr + nfr,
            gsr_loss=gsr,
            nfr_loss=nfr,
            logits=logits,
            target_cls=target_hidden[:, 0],
        )

    def _corrupt(self, target_ids: Array):
        """Random node replacement + masking for NFR (reference
        models.py:129-151). Never touches position 0 (the target) or
        padding; targets for reconstruction are the post-replacement ids.

        The replace and mask draws are INDEPENDENT, so a slot can be
        replaced with a random node and then masked — its NFR target is
        then the random node, not the original. That overlap (~replace
        ratio x mask ratio of context slots) is reference-faithful, not
        a bug: models.py:150 reads ``target_idx`` from the ids AFTER the
        random replacement was written into them."""
        rng = self.make_rng("corruption")
        r_replace, r_ids, r_mask = jax.random.split(rng, 3)
        ctx = target_ids[:, 1:]
        shape = ctx.shape

        rand1 = jax.random.uniform(r_replace, shape)
        replace = (rand1 < self.random_node_ratio) & (ctx != 0)
        random_ids = jax.random.randint(
            r_ids,
            shape,
            minval=NUM_SPECIAL_NODES,
            maxval=self.node_size + NUM_SPECIAL_NODES,
            dtype=ctx.dtype,
        )
        ctx_replaced = jnp.where(replace, random_ids, ctx)

        rand2 = jax.random.uniform(r_mask, shape)
        masked = (rand2 < self.mask_node_ratio) & (ctx_replaced != 0)
        ctx_masked = jnp.where(masked, jnp.asarray(1, ctx.dtype), ctx_replaced)

        masked_ids = jnp.concatenate([target_ids[:, :1], ctx_masked], axis=1)
        return masked_ids, masked.astype(jnp.float32), ctx_replaced

    # ------------------------------------------------------------------
    def _nfr_loss(
        self,
        feat_tables: Sequence[Array],
        masked_hidden: Array,  # [B, S, H]
        pos_mask: Array,  # [B, S-1] — 1 where a context slot was masked
        target_ids: Array,  # [B, S-1] — pre-masking (post-replacement) ids
    ) -> Array:
        """Node Feature Reconstruction: per-modality linear projection of
        masked-position hidden states, MSE against the original modality
        embeddings, mean over modalities (reference
        modeling_pmgt.py:549-569)."""
        ctx_hidden = masked_hidden[:, 1:]  # [B, S-1, H]
        count = jnp.sum(pos_mask)
        losses = []
        for proj, table in zip(self.nfr_projections, feat_tables):
            pred = proj(ctx_hidden)  # [B, S-1, F]
            target = table_rows(table, target_ids, pred.dtype)
            # Accumulate the F-long (up to 1536 terms) per-row sum in
            # f32: under the bf16 policy a bf16 accumulator loses terms
            # to rounding once the running sum is ~256x a term — percent-
            # level error in the loss HPO/quality comparisons consume.
            sq = jnp.sum(
                (pred - target) ** 2, axis=-1, dtype=jnp.float32
            )  # [B, S-1]
            denom = jnp.maximum(count * pred.shape[-1], 1.0)
            losses.append(jnp.sum(sq * pos_mask) / denom)
        return jnp.mean(jnp.stack(losses))
