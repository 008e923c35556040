"""Fused Pallas TPU kernel for PMGT's dual attention.

The dual-attention core (reference modeling_pmgt.py:420-534) blends a
diversity-promoting distribution P1 = softmax(1 - cos(c, c) + I + M) with
standard scaled dot-product attention P2 = softmax(qkᵀ/√d + M):

    out = (beta * P1 + (1 - beta) * P2) @ v

With S=6-token sequences this is bandwidth-bound VPU work spread over many
small XLA ops; the kernel fuses the norms, both score matrices, both
softmaxes, the blend, and the value contraction into one VMEM-resident
pass over batch tiles.

Dropout on the two probability matrices is supported by passing
pre-sampled keep masks (generated with jax.random outside the kernel) so
the custom-VJP backward — which recomputes via the XLA formulation — sees
the identical dropout pattern.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 256  # batch-lane rows per grid step (forward)
BLOCK_B_BWD = 128  # backward holds more f32 intermediates in VMEM


def _fwd_math(q, k, v, c, add_mask, m1, m2,
              *, beta: float, keep: float, use_dropout: bool):
    """Shared forward math on f32 batch-major VMEM blocks.

    q/k/v/c: [TB, S, d] f32; add_mask: [TB, 1, S] f32;
    m1/m2: [TB, S, S] f32 keep masks (ignored unless use_dropout).
    Returns the blended attention output [TB, S, d] f32.
    """
    f32 = jnp.float32
    s = q.shape[1]
    d = q.shape[2]

    def bmm_nt(a, b):  # [TB, S, d] x [TB, S, d] -> [TB, S, S]
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32,
        )

    # --- diversity-promoting scores ---
    norm_sq = jnp.sum(c * c, axis=-1, keepdims=True)  # [TB, S, 1]
    norm = jnp.sqrt(norm_sq)
    norm_outer = jax.lax.dot_general(
        norm, norm,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # [TB, S, S]
    cos = bmm_nt(c, c) / jnp.maximum(norm_outer, 1e-12)
    eye = jnp.eye(s, dtype=f32)[None]
    s1 = 1.0 - cos + eye + add_mask
    s1 = s1 - jnp.max(s1, axis=-1, keepdims=True)
    e1 = jnp.exp(s1)
    p1 = e1 / jnp.sum(e1, axis=-1, keepdims=True)

    # --- standard scaled dot-product scores ---
    s2 = bmm_nt(q, k) * (1.0 / (d ** 0.5)) + add_mask
    s2 = s2 - jnp.max(s2, axis=-1, keepdims=True)
    e2 = jnp.exp(s2)
    p2 = e2 / jnp.sum(e2, axis=-1, keepdims=True)

    if use_dropout:
        inv_keep = 1.0 / keep
        p1 = p1 * m1 * inv_keep
        p2 = p2 * m2 * inv_keep

    probs = beta * p1 + (1.0 - beta) * p2  # [TB, S, S]
    return jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )


def _kernel(q_ref, k_ref, v_ref, c_ref, mask_ref, m1_ref, m2_ref, out_ref,
            *, beta: float, keep: float, use_dropout: bool):
    f32 = jnp.float32
    out = _fwd_math(
        q_ref[:].astype(f32), k_ref[:].astype(f32), v_ref[:].astype(f32),
        c_ref[:].astype(f32), mask_ref[:].astype(f32),
        m1_ref[:].astype(f32) if use_dropout else None,
        m2_ref[:].astype(f32) if use_dropout else None,
        beta=beta, keep=keep, use_dropout=use_dropout,
    )
    out_ref[:] = out.astype(out_ref.dtype)


def _pallas_forward(q, k, v, c, add_mask, m1, m2, *, beta, keep, use_dropout):
    """q,k,v,c: [B, S, d]; add_mask: [B, 1, S]; m1/m2: [B, S, S] keep masks."""
    b, s, d = q.shape
    pad = (-b) % BLOCK_B
    if pad:
        padder = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        q, k, v, c, add_mask, m1, m2 = map(padder, (q, k, v, c, add_mask, m1, m2))
    bp = q.shape[0]
    grid = (bp // BLOCK_B,)

    def spec(shape):
        return pl.BlockSpec(
            (BLOCK_B,) + shape,
            lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(
            _kernel, beta=beta, keep=keep, use_dropout=use_dropout
        ),
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            spec((s, d)),  # q
            spec((s, d)),  # k
            spec((s, d)),  # v
            spec((s, d)),  # c
            spec((1, s)),  # mask
            spec((s, s)),  # m1
            spec((s, s)),  # m2
        ],
        out_specs=spec((s, d)),
        out_shape=jax.ShapeDtypeStruct((bp, s, d), q.dtype),
    )(q, k, v, c, add_mask, m1, m2)
    return out[:b]


def _bwd_math(q, k, v, c, add_mask, m1_raw, m2_raw, g,
              *, beta: float, keep: float, use_dropout: bool):
    """Shared backward math on f32 batch-major VMEM blocks: recomputes the
    forward internals, then applies the chain rule for both attention
    distributions, including the cosine-similarity term.

    q/k/v/c/g: [TB, S, d] f32; add_mask: [TB, 1, S] f32;
    m1_raw/m2_raw: [TB, S, S] f32 keep masks (ignored unless use_dropout).
    Returns (dq, dk, dv, dc), each [TB, S, d] f32.
    """
    f32 = jnp.float32
    s = q.shape[1]
    d = q.shape[2]

    def bmm_nt(a, b):  # [TB,S,x] @ [TB,S,x]^T -> [TB,S,S]
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)

    def bmm_nn(a, b):  # [TB,S,S] @ [TB,S,d] -> [TB,S,d]
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)

    def bmm_tn(a, b):  # [TB,S,S]^T @ [TB,S,d] -> [TB,S,d]
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)

    # ---- recompute forward ----
    norm_sq = jnp.sum(c * c, axis=-1, keepdims=True)
    norm = jnp.sqrt(norm_sq)  # [TB, S, 1]
    n_outer = jax.lax.dot_general(
        norm, norm, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32)
    n_outer = jnp.maximum(n_outer, 1e-12)
    cos = bmm_nt(c, c) / n_outer
    eye = jnp.eye(s, dtype=f32)[None]
    s1 = 1.0 - cos + eye + add_mask
    s1 = s1 - jnp.max(s1, axis=-1, keepdims=True)
    e1 = jnp.exp(s1)
    p1 = e1 / jnp.sum(e1, axis=-1, keepdims=True)

    inv_sqrt_d = 1.0 / (d ** 0.5)
    s2 = bmm_nt(q, k) * inv_sqrt_d + add_mask
    s2 = s2 - jnp.max(s2, axis=-1, keepdims=True)
    e2 = jnp.exp(s2)
    p2 = e2 / jnp.sum(e2, axis=-1, keepdims=True)

    if use_dropout:
        inv_keep = 1.0 / keep
        m1 = m1_raw * inv_keep
        m2 = m2_raw * inv_keep
        p1d = p1 * m1
        p2d = p2 * m2
    else:
        p1d, p2d = p1, p2
    probs = beta * p1d + (1.0 - beta) * p2d

    # ---- backward ----
    dv = bmm_tn(probs, g)  # [TB, S, d]
    dprobs = bmm_nt(g, v)  # [TB, S, S]

    dp1 = beta * dprobs
    dp2 = (1.0 - beta) * dprobs
    if use_dropout:
        dp1 = dp1 * m1
        dp2 = dp2 * m2

    # softmax backward per distribution
    ds1 = p1 * (dp1 - jnp.sum(dp1 * p1, axis=-1, keepdims=True))
    ds2 = p2 * (dp2 - jnp.sum(dp2 * p2, axis=-1, keepdims=True))

    # qk branch
    dq = bmm_nn(ds2, k) * inv_sqrt_d
    dk = bmm_tn(ds2, q) * inv_sqrt_d

    # cosine branch: s1 = 1 - cos + ... → dcos = -ds1
    dcos = -ds1
    gsym = dcos + jnp.swapaxes(dcos, 1, 2)  # [TB, S, S]
    a = gsym / n_outer
    # dc_i = sum_j A_ij c_j  -  (sum_j G_ij C_ij / n_i^2) c_i
    dc = bmm_nn(a, c)
    srow = jnp.sum(gsym * cos, axis=-1, keepdims=True) / jnp.maximum(
        norm_sq, 1e-12
    )
    dc = dc - srow * c
    return dq, dk, dv, dc


def _bwd_kernel(q_ref, k_ref, v_ref, c_ref, mask_ref, m1_ref, m2_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dc_ref,
                *, beta: float, keep: float, use_dropout: bool):
    f32 = jnp.float32
    dq, dk, dv, dc = _bwd_math(
        q_ref[:].astype(f32), k_ref[:].astype(f32), v_ref[:].astype(f32),
        c_ref[:].astype(f32), mask_ref[:].astype(f32),
        m1_ref[:].astype(f32) if use_dropout else None,
        m2_ref[:].astype(f32) if use_dropout else None,
        g_ref[:].astype(f32),
        beta=beta, keep=keep, use_dropout=use_dropout,
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)
    dc_ref[:] = dc.astype(dc_ref.dtype)


def _pallas_backward(q, k, v, c, add_mask, m1, m2, g, *, beta, keep, use_dropout):
    b, s, d = q.shape
    pad = (-b) % BLOCK_B_BWD
    if pad:
        padder = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        q, k, v, c, add_mask, m1, m2, g = map(
            padder, (q, k, v, c, add_mask, m1, m2, g)
        )
    bp = q.shape[0]
    grid = (bp // BLOCK_B_BWD,)

    def spec(shape):
        return pl.BlockSpec(
            (BLOCK_B_BWD,) + shape,
            lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    out_shape = jax.ShapeDtypeStruct((bp, s, d), q.dtype)
    dq, dk, dv, dc = pl.pallas_call(
        functools.partial(
            _bwd_kernel, beta=beta, keep=keep, use_dropout=use_dropout
        ),
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            spec((s, d)),  # q
            spec((s, d)),  # k
            spec((s, d)),  # v
            spec((s, d)),  # c
            spec((1, s)),  # mask
            spec((s, s)),  # m1
            spec((s, s)),  # m2
            spec((s, d)),  # g
        ],
        out_specs=(spec((s, d)),) * 4,
        out_shape=(out_shape,) * 4,
    )(q, k, v, c, add_mask, m1, m2, g)
    return dq[:b], dk[:b], dv[:b], dc[:b]


def _xla_forward(q, k, v, c, add_mask, m1, m2, *, beta, keep, use_dropout):
    """Identical math in plain XLA — the reference for the custom VJP."""
    f32 = jnp.float32
    d = q.shape[-1]
    cf = c.astype(f32)
    norm = jnp.sqrt(jnp.sum(cf * cf, axis=-1, keepdims=True))
    norm_outer = jnp.einsum("bid,bjd->bij", norm, norm)
    cos = jnp.einsum("bid,bjd->bij", cf, cf) / jnp.maximum(norm_outer, 1e-12)
    eye = jnp.eye(q.shape[1], dtype=f32)[None]
    p1 = jax.nn.softmax(1.0 - cos + eye + add_mask, axis=-1)
    s2 = jnp.einsum("bid,bjd->bij", q.astype(f32), k.astype(f32)) / jnp.sqrt(
        jnp.asarray(d, f32)
    ) + add_mask
    p2 = jax.nn.softmax(s2, axis=-1)
    if use_dropout:
        p1 = p1 * m1.astype(f32) / keep
        p2 = p2 * m2.astype(f32) / keep
    probs = beta * p1 + (1.0 - beta) * p2
    return jnp.einsum("bij,bjd->bid", probs, v.astype(f32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused(q, k, v, c, add_mask, m1, m2, beta, keep, use_dropout):
    return _pallas_forward(
        q, k, v, c, add_mask, m1, m2,
        beta=beta, keep=keep, use_dropout=use_dropout,
    )


def _fused_fwd(q, k, v, c, add_mask, m1, m2, beta, keep, use_dropout):
    out = _pallas_forward(
        q, k, v, c, add_mask, m1, m2,
        beta=beta, keep=keep, use_dropout=use_dropout,
    )
    return out, (q, k, v, c, add_mask, m1, m2)


def _fused_bwd(beta, keep, use_dropout, residuals, g):
    q, k, v, c, add_mask, m1, m2 = residuals
    dq, dk, dv, dc = _pallas_backward(
        q, k, v, c, add_mask, m1, m2, g,
        beta=beta, keep=keep, use_dropout=use_dropout,
    )
    return dq, dk, dv, dc, None, None, None


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Seq-major kernels
#
# The rank-3 [B, S, d] formulation above pays for the tiny S=6 axis twice:
# Mosaic tiles (S, d) as (8, 128) so every elementwise op wastes 25% of its
# sublanes, and the custom-call's dense-layout operand constraint forces
# XLA to re-layout the [B*S, d] matmul outputs into padded [B, 6, d] tiles
# at every kernel boundary (the "copy_add"/data-formatting ~2 ms/step in
# the round-3 trace). Storing activations SEQ-MAJOR — [S, N, d], token
# position outermost — fixes both: position slices x[i] are perfectly
# tiled [N, d] arrays, and [S*N, d] row-major matmul outputs reshape to
# [S, N, d] for free (leading-dim split). The per-sequence S x S math
# becomes S lane-reductions per score row, all on dense [TB, d] tiles.
# ---------------------------------------------------------------------------

# Overridable for block-size sweeps (tools/bench_attn.py). The round-3
# sweep was flat (±2%) across the feasible range — fwd 512 / bwd 256
# scoped-VMEM OOM — so the defaults are uncritical.
BLOCK_N_SM = int(os.environ.get("PMGT_TPU_ATTN_BLOCK", "256"))
BLOCK_N_SM_BWD = int(os.environ.get("PMGT_TPU_ATTN_BLOCK_BWD", "128"))


def _kernel_sm(q_ref, k_ref, v_ref, c_ref, mask_ref, m1_ref, m2_ref,
               out_ref, *, beta: float, keep: float, use_dropout: bool):
    """q/k/v/c: [S, TB, d]; mask: [TB, S] additive over keys;
    m1/m2: [S, TB, S] keep masks; out: [S, TB, d].

    The seq-major HBM layout kills the call-boundary relayout copies;
    inside the kernel the block transposes to [TB, S, d] (a VMEM-local
    shuffle, far cheaper than HBM copies) so the S x S math runs as the
    same batched MXU contractions as the batch-major kernel — the
    unrolled per-position lane-reduction formulation measured ~2.7x
    slower than these batched dots."""
    f32 = jnp.float32
    to_bm = lambda ref: ref[:].astype(f32).transpose(1, 0, 2)  # noqa: E731
    out = _fwd_math(
        to_bm(q_ref), to_bm(k_ref), to_bm(v_ref), to_bm(c_ref),
        mask_ref[:].astype(f32)[:, None, :],
        to_bm(m1_ref) if use_dropout else None,
        to_bm(m2_ref) if use_dropout else None,
        beta=beta, keep=keep, use_dropout=use_dropout,
    )  # [TB, S, d]
    out_ref[:] = out.transpose(1, 0, 2).astype(out_ref.dtype)


def _pallas_forward_sm(q, k, v, c, mask_bs, m1, m2, *, beta, keep,
                       use_dropout):
    """q,k,v,c: [S, N, d]; mask_bs: [N, S]; m1/m2: [S, N, S]."""
    s, n, d = q.shape
    pad = (-n) % BLOCK_N_SM
    if pad:
        q, k, v, c = (
            jnp.pad(x, ((0, 0), (0, pad), (0, 0))) for x in (q, k, v, c)
        )
        mask_bs = jnp.pad(mask_bs, ((0, pad), (0, 0)))
        m1 = jnp.pad(m1, ((0, 0), (0, pad), (0, 0)))
        m2 = jnp.pad(m2, ((0, 0), (0, pad), (0, 0)))
    np_ = q.shape[1]
    grid = (np_ // BLOCK_N_SM,)

    def spec3(last):
        return pl.BlockSpec(
            (s, BLOCK_N_SM, last), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )

    mask_spec = pl.BlockSpec(
        (BLOCK_N_SM, s), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_sm, beta=beta, keep=keep, use_dropout=use_dropout
        ),
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            spec3(d), spec3(d), spec3(d), spec3(d),
            mask_spec,
            spec3(s), spec3(s),
        ],
        out_specs=spec3(d),
        out_shape=jax.ShapeDtypeStruct((s, np_, d), q.dtype),
    )(q, k, v, c, mask_bs, m1, m2)
    return out[:, :n]


def _bwd_kernel_sm(q_ref, k_ref, v_ref, c_ref, mask_ref, m1_ref, m2_ref,
                   g_ref, dq_ref, dk_ref, dv_ref, dc_ref,
                   *, beta: float, keep: float, use_dropout: bool):
    """Seq-major backward: VMEM-local transpose to batch-major, then the
    shared batched-MXU chain rule (_bwd_math), transposing the grads back
    on write-out."""
    f32 = jnp.float32
    to_bm = lambda ref: ref[:].astype(f32).transpose(1, 0, 2)  # noqa: E731
    dq, dk, dv, dc = _bwd_math(
        to_bm(q_ref), to_bm(k_ref), to_bm(v_ref), to_bm(c_ref),
        mask_ref[:].astype(f32)[:, None, :],
        to_bm(m1_ref) if use_dropout else None,
        to_bm(m2_ref) if use_dropout else None,
        to_bm(g_ref),
        beta=beta, keep=keep, use_dropout=use_dropout,
    )
    dq_ref[:] = dq.transpose(1, 0, 2).astype(dq_ref.dtype)
    dk_ref[:] = dk.transpose(1, 0, 2).astype(dk_ref.dtype)
    dv_ref[:] = dv.transpose(1, 0, 2).astype(dv_ref.dtype)
    dc_ref[:] = dc.transpose(1, 0, 2).astype(dc_ref.dtype)


def _pallas_backward_sm(q, k, v, c, mask_bs, m1, m2, g, *, beta, keep,
                        use_dropout):
    s, n, d = q.shape
    pad = (-n) % BLOCK_N_SM_BWD
    if pad:
        q, k, v, c, g = (
            jnp.pad(x, ((0, 0), (0, pad), (0, 0))) for x in (q, k, v, c, g)
        )
        mask_bs = jnp.pad(mask_bs, ((0, pad), (0, 0)))
        m1 = jnp.pad(m1, ((0, 0), (0, pad), (0, 0)))
        m2 = jnp.pad(m2, ((0, 0), (0, pad), (0, 0)))
    np_ = q.shape[1]
    grid = (np_ // BLOCK_N_SM_BWD,)

    def spec3(last):
        return pl.BlockSpec(
            (s, BLOCK_N_SM_BWD, last), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )

    mask_spec = pl.BlockSpec(
        (BLOCK_N_SM_BWD, s), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((s, np_, d), q.dtype)
    dq, dk, dv, dc = pl.pallas_call(
        functools.partial(
            _bwd_kernel_sm, beta=beta, keep=keep, use_dropout=use_dropout
        ),
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            spec3(d), spec3(d), spec3(d), spec3(d),
            mask_spec,
            spec3(s), spec3(s), spec3(d),
        ],
        out_specs=(spec3(d),) * 4,
        out_shape=(out_shape,) * 4,
    )(q, k, v, c, mask_bs, m1, m2, g)
    return dq[:, :n], dk[:, :n], dv[:, :n], dc[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_sm(q, k, v, c, mask_bs, m1, m2, beta, keep, use_dropout):
    return _pallas_forward_sm(
        q, k, v, c, mask_bs, m1, m2,
        beta=beta, keep=keep, use_dropout=use_dropout,
    )


def _fused_sm_fwd(q, k, v, c, mask_bs, m1, m2, beta, keep, use_dropout):
    out = _pallas_forward_sm(
        q, k, v, c, mask_bs, m1, m2,
        beta=beta, keep=keep, use_dropout=use_dropout,
    )
    return out, (q, k, v, c, mask_bs, m1, m2)


def _fused_sm_bwd(beta, keep, use_dropout, residuals, g):
    q, k, v, c, mask_bs, m1, m2 = residuals
    dq, dk, dv, dc = _pallas_backward_sm(
        q, k, v, c, mask_bs, m1, m2, g,
        beta=beta, keep=keep, use_dropout=use_dropout,
    )
    return dq, dk, dv, dc, None, None, None


_fused_sm.defvjp(_fused_sm_fwd, _fused_sm_bwd)


def dual_attention_pallas_sm(
    query,
    key,
    value,
    ctx,
    mask_bs,
    beta: float,
    dropout_rate: float,
    deterministic: bool,
    dropout_rng: Optional[jax.Array],
):
    """Seq-major dual attention: q/k/v/c are [S, N, d] (N = batch x heads),
    mask_bs is the additive key mask [N, S]. Returns [S, N, d]."""
    s, n, d = query.shape
    use_dropout = (not deterministic) and dropout_rate > 0.0
    keep = 1.0 - dropout_rate
    if use_dropout:
        if dropout_rng is None:
            raise ValueError(
                "dropout_rng is required when dropout_rate > 0 and "
                "deterministic=False"
            )
        r1, r2 = jax.random.split(dropout_rng)
        m1 = jax.random.bernoulli(r1, keep, (s, n, s))
        m2 = jax.random.bernoulli(r2, keep, (s, n, s))
    else:
        m1 = jnp.ones((s, n, s), jnp.bool_)
        m2 = m1
    return _fused_sm(
        query, key, value, ctx, mask_bs, m1, m2,
        float(beta), float(keep), use_dropout,
    )


def dual_attention_pallas(
    query,
    key,
    value,
    ctx,
    additive_mask,
    beta: float,
    dropout_rate: float,
    deterministic: bool,
    dropout_rng: Optional[jax.Array],
):
    """Drop-in replacement for models.pmgt.dual_attention_xla.

    Inputs are [B, h, S, d]; heads are folded into the batch dimension for
    the kernel.
    """
    b, h, s, d = query.shape
    fold = lambda x: x.reshape(b * h, s, d)
    q, k, v, c = map(fold, (query, key, value, ctx))

    if additive_mask is not None:
        # [B, 1, 1, S] (or broadcastable) -> [B*h, 1, S]
        mask = jnp.broadcast_to(additive_mask, (b, h, 1, s)).reshape(b * h, 1, s)
    else:
        mask = jnp.zeros((b * h, 1, s), q.dtype)

    use_dropout = (not deterministic) and dropout_rate > 0.0
    keep = 1.0 - dropout_rate
    if use_dropout:
        if dropout_rng is None:
            raise ValueError(
                "dropout_rng is required when dropout_rate > 0 and "
                "deterministic=False"
            )
        r1, r2 = jax.random.split(dropout_rng)
        m1 = jax.random.bernoulli(r1, keep, (b * h, s, s))
        m2 = jax.random.bernoulli(r2, keep, (b * h, s, s))
    else:
        m1 = jnp.ones((b * h, s, s), jnp.bool_)
        m2 = m1

    out = _fused(q, k, v, c, mask, m1, m2, float(beta), float(keep), use_dropout)
    return out.reshape(b, h, s, d)
