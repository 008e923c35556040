"""Fully fused PMGT encoder layer as Pallas TPU kernels (fwd + bwd).

One transformer layer — qkv/ctx projections, dual attention, attention
output, both LayerNorms, the GELU FFN, residuals, and all dropouts — runs
as a single VMEM-resident kernel per batch tile, with a hand-written
backward kernel that recomputes the forward locals and accumulates weight
gradients across tiles. This removes every per-layer HBM round-trip that
the XLA fusion pipeline pays on [B, 6, 128]-shaped tensors.

Scope: single-head attention with head_dim == hidden_size (the paper
configuration: hidden 128, 1 head) and absolute positions. Multi-head or
relative-position configs take the per-op path in models/pmgt.py.

Selected with ``attention_impl="fused_layer"``. Status: **experimental** —
numerically validated against the per-op layer (fwd, dx, and all weight
grads, including multi-tile accumulation), but measured on v5e the
backward is slower than XLA's own fusion pipeline (the 19 weight-grad
output blocks are read-modify-written every batch tile, and the f32
intermediates force a 64-row tile). The default TPU path is therefore the
Pallas *attention* kernel (ops/dual_attention.py), which measures +11%
end-to-end. Kept as the starting point for a scratch-accumulator rewrite.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

BLOCK_FWD = int(os.environ.get("PMGT_FUSED_BLOCK_FWD", 256))
BLOCK_BWD = int(os.environ.get("PMGT_FUSED_BLOCK_BWD", 64))
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


class LayerParams(NamedTuple):
    """Raw parameter arrays for one layer (all [H, ...] row-major)."""

    wq: jax.Array
    bq: jax.Array
    wk: jax.Array
    bk: jax.Array
    wv: jax.Array
    bv: jax.Array
    wc: jax.Array
    bc: jax.Array
    wo: jax.Array
    bo: jax.Array
    ln1_scale: jax.Array
    ln1_bias: jax.Array
    wi: jax.Array
    bi: jax.Array
    w2: jax.Array
    b2: jax.Array
    ln2_scale: jax.Array
    ln2_bias: jax.Array


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational approximation (|err| < 1.5e-7).
    Mosaic has no erf lowering; exp is supported."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(u):
    return u * 0.5 * (1.0 + _erf(u * _INV_SQRT2))


def _gelu_grad(u):
    phi = jnp.exp(-0.5 * u * u) * _INV_SQRT_2PI
    cdf = 0.5 * (1.0 + _erf(u * _INV_SQRT2))
    return cdf + u * phi


def _ln_fwd(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dy, xhat, inv, scale):
    """Returns dx given upstream dy; caller sums dscale/dbias itself."""
    h = dy * scale
    m1 = jnp.mean(h, axis=-1, keepdims=True)
    m2 = jnp.mean(h * xhat, axis=-1, keepdims=True)
    return (h - m1 - xhat * m2) * inv


def _attention_core(x, params_read, add_mask, m1, m2, *, beta, keep,
                    use_dropout, want_residuals, store_dtype=jnp.float32):
    """Shared fwd math on one tile. x: [TB, S, H] f32. ``store_dtype``
    is the storage precision for the large per-token intermediates
    (bf16 halves VMEM so the backward tile can double; matmuls always
    accumulate in f32)."""
    (wq, bq, wk, bk, wv, bv, wc, bc) = params_read
    tb, s, h = x.shape
    x2 = x.reshape(tb * s, h).astype(store_dtype)

    def lin(w, b):
        return (
            jnp.dot(x2, w.astype(store_dtype), preferred_element_type=jnp.float32)
            + b
        ).reshape(tb, s, h).astype(store_dtype)

    q = lin(wq, bq)
    k = lin(wk, bk)
    v = lin(wv, bv)
    c = lin(wc, bc)

    def bmm_nt(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    cf = c.astype(jnp.float32)
    norm_sq = jnp.sum(cf * cf, axis=-1, keepdims=True)
    norm = jnp.sqrt(norm_sq)
    n_outer = jnp.maximum(
        jax.lax.dot_general(
            norm, norm, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32),
        1e-12,
    )
    cos = bmm_nt(c, c) / n_outer
    eye = jnp.eye(s, dtype=jnp.float32)[None]
    s1 = 1.0 - cos + eye + add_mask
    p1 = jax.nn.softmax(s1, axis=-1)

    inv_sqrt_d = 1.0 / (h ** 0.5)
    s2 = bmm_nt(q, k) * inv_sqrt_d + add_mask
    p2 = jax.nn.softmax(s2, axis=-1)

    if use_dropout:
        inv_keep = 1.0 / keep
        p1d = p1 * m1 * inv_keep
        p2d = p2 * m2 * inv_keep
    else:
        p1d, p2d = p1, p2
    probs = (beta * p1d + (1.0 - beta) * p2d).astype(store_dtype)
    ctxout = jax.lax.dot_general(
        probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    if not want_residuals:
        return ctxout
    return ctxout, (q, k, v, c, p1, p2, probs, cos, norm_sq, n_outer)


def _fwd_kernel(x_ref, mask_ref, m1_ref, m2_ref, d1_ref, d2_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                wc_ref, bc_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref,
                wi_ref, bi_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
                out_ref, *, beta, keep, use_dropout, eps):
    f32 = jnp.float32
    x = x_ref[:].astype(f32)
    tb, s, h = x.shape
    add_mask = mask_ref[:].astype(f32)
    m1 = m1_ref[:].astype(f32) if use_dropout else None
    m2 = m2_ref[:].astype(f32) if use_dropout else None

    pr = tuple(
        r[:].astype(f32)
        for r in (wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wc_ref, bc_ref)
    )
    ctxout = _attention_core(
        x, pr, add_mask, m1, m2,
        beta=beta, keep=keep, use_dropout=use_dropout, want_residuals=False,
    )

    wo = wo_ref[:].astype(f32)
    a = (
        jnp.dot(ctxout.reshape(tb * s, h), wo, preferred_element_type=f32)
        + bo_ref[:].astype(f32)
    ).reshape(tb, s, h)
    if use_dropout:
        a = a * d1_ref[:].astype(f32) / keep
    h1, _, _ = _ln_fwd(a + x, ln1s_ref[:].astype(f32), ln1b_ref[:].astype(f32), eps)

    wi = wi_ref[:].astype(f32)
    u = (
        jnp.dot(h1.reshape(tb * s, h), wi, preferred_element_type=f32)
        + bi_ref[:].astype(f32)
    )
    f = _gelu_exact(u)
    w2 = w2_ref[:].astype(f32)
    o = (
        jnp.dot(f, w2, preferred_element_type=f32) + b2_ref[:].astype(f32)
    ).reshape(tb, s, h)
    if use_dropout:
        o = o * d2_ref[:].astype(f32) / keep
    y, _, _ = _ln_fwd(o + h1, ln2s_ref[:].astype(f32), ln2b_ref[:].astype(f32), eps)
    out_ref[:] = y.astype(out_ref.dtype)


def _bwd_kernel(x_ref, mask_ref, m1_ref, m2_ref, d1_ref, d2_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                wc_ref, bc_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref,
                wi_ref, bi_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
                g_ref,
                dx_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref,
                dbv_ref, dwc_ref, dbc_ref, dwo_ref, dbo_ref, dln1s_ref,
                dln1b_ref, dwi_ref, dbi_ref, dw2_ref, db2_ref, dln2s_ref,
                dln2b_ref, *, beta, keep, use_dropout, eps,
                store_dtype=jnp.float32):
    f32 = jnp.float32
    sd = lambda t: t.astype(store_dtype)  # matmul-input storage cast
    x = x_ref[:].astype(f32)
    tb, s, h = x.shape
    n = tb * s
    add_mask = mask_ref[:].astype(f32)
    m1 = m1_ref[:].astype(f32) if use_dropout else None
    m2 = m2_ref[:].astype(f32) if use_dropout else None
    d1 = d1_ref[:].astype(f32) if use_dropout else None
    d2 = d2_ref[:].astype(f32) if use_dropout else None
    g = g_ref[:].astype(f32)

    pr = tuple(
        r[:].astype(f32)
        for r in (wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wc_ref, bc_ref)
    )
    wo = wo_ref[:].astype(f32)
    wi = wi_ref[:].astype(f32)
    w2 = w2_ref[:].astype(f32)
    ln1s = ln1s_ref[:].astype(f32)
    ln2s = ln2s_ref[:].astype(f32)

    # ---------------- recompute forward ----------------
    ctxout, (q, k, v, c, p1, p2, probs, cos, norm_sq, n_outer) = (
        _attention_core(
            x, pr, add_mask, m1, m2,
            beta=beta, keep=keep, use_dropout=use_dropout,
            want_residuals=True, store_dtype=store_dtype,
        )
    )
    ctxout = sd(ctxout)
    a_pre = (
        jnp.dot(ctxout.reshape(n, h), sd(wo), preferred_element_type=f32)
        + bo_ref[:].astype(f32)
    ).reshape(tb, s, h)
    a = a_pre * d1 / keep if use_dropout else a_pre
    r1 = a + x
    h1, xhat1, inv1 = _ln_fwd(r1, ln1s, ln1b_ref[:].astype(f32), eps)
    h1s = sd(h1)
    u = (
        jnp.dot(h1s.reshape(n, h), sd(wi), preferred_element_type=f32)
        + bi_ref[:].astype(f32)
    )
    f = sd(_gelu_exact(u))
    o_pre = (
        jnp.dot(f, sd(w2), preferred_element_type=f32) + b2_ref[:].astype(f32)
    ).reshape(tb, s, h)
    o = o_pre * d2 / keep if use_dropout else o_pre
    r2 = o + h1
    _, xhat2, inv2 = _ln_fwd(r2, ln2s, ln2b_ref[:].astype(f32), eps)

    # ---------------- backward ----------------
    first = pl.program_id(0) == 0

    def acc(ref, value):
        @pl.when(first)
        def _():
            ref[:] = jnp.zeros_like(ref)

        ref[:] += value.astype(ref.dtype)

    def mm_tn(a2, b2):  # aᵀ @ b over token rows: [n, p]ᵀ [n, q] -> [p, q]
        return jax.lax.dot_general(
            sd(a2), sd(b2), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    # LN2
    acc(dln2s_ref, jnp.sum((g * xhat2).reshape(n, h), axis=0))
    acc(dln2b_ref, jnp.sum(g.reshape(n, h), axis=0))
    dr2 = _ln_bwd(g, xhat2, inv2, ln2s)

    do = dr2 * d2 / keep if use_dropout else dr2
    dh1 = dr2  # residual

    do2 = do.reshape(n, h)
    acc(dw2_ref, mm_tn(f, do2))
    acc(db2_ref, jnp.sum(do2, axis=0))
    df = jnp.dot(sd(do2), sd(w2.T), preferred_element_type=f32)
    du = df * _gelu_grad(u)
    acc(dwi_ref, mm_tn(h1s.reshape(n, h), du))
    acc(dbi_ref, jnp.sum(du, axis=0))
    dh1 = dh1 + jnp.dot(sd(du), sd(wi.T), preferred_element_type=f32).reshape(tb, s, h)

    # LN1
    acc(dln1s_ref, jnp.sum((dh1 * xhat1).reshape(n, h), axis=0))
    acc(dln1b_ref, jnp.sum(dh1.reshape(n, h), axis=0))
    dr1 = _ln_bwd(dh1, xhat1, inv1, ln1s)

    da = dr1 * d1 / keep if use_dropout else dr1
    dx = dr1  # residual

    da2 = da.reshape(n, h)
    acc(dwo_ref, mm_tn(ctxout.reshape(n, h), da2))
    acc(dbo_ref, jnp.sum(da2, axis=0))
    dctx = jnp.dot(sd(da2), sd(wo.T), preferred_element_type=f32).reshape(tb, s, h)

    # ---- attention backward (see ops/dual_attention.py) ----
    def bmm_nt(a3, b3):
        return jax.lax.dot_general(
            sd(a3), sd(b3), dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)

    def bmm_nn(a3, b3):
        return jax.lax.dot_general(
            sd(a3), sd(b3), dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)

    def bmm_tn3(a3, b3):
        return jax.lax.dot_general(
            sd(a3), sd(b3), dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)

    dv3 = bmm_tn3(probs, dctx)
    dprobs = bmm_nt(dctx, v)
    dp1 = beta * dprobs
    dp2 = (1.0 - beta) * dprobs
    if use_dropout:
        dp1 = dp1 * m1 / keep
        dp2 = dp2 * m2 / keep
    ds1 = p1 * (dp1 - jnp.sum(dp1 * p1, axis=-1, keepdims=True))
    ds2 = p2 * (dp2 - jnp.sum(dp2 * p2, axis=-1, keepdims=True))

    inv_sqrt_d = 1.0 / (h ** 0.5)
    dq3 = bmm_nn(ds2, k) * inv_sqrt_d
    dk3 = bmm_tn3(ds2, q) * inv_sqrt_d

    dcos = -ds1
    gsym = dcos + jnp.swapaxes(dcos, 1, 2)
    arow = gsym / n_outer
    dc3 = bmm_nn(arow, c)
    srow = jnp.sum(gsym * cos, axis=-1, keepdims=True) / jnp.maximum(
        norm_sq, 1e-12
    )
    dc3 = dc3 - srow * c

    # projection backward: z = x @ W + b for z in {q, k, v, c}
    x2 = x.reshape(n, h)
    for dz, w_ref_pair in (
        (dq3, (dwq_ref, dbq_ref, pr[0])),
        (dk3, (dwk_ref, dbk_ref, pr[2])),
        (dv3, (dwv_ref, dbv_ref, pr[4])),
        (dc3, (dwc_ref, dbc_ref, pr[6])),
    ):
        dw_ref, db_ref, w_val = w_ref_pair
        dz2 = dz.reshape(n, h)
        acc(dw_ref, mm_tn(x2, dz2))
        acc(db_ref, jnp.sum(dz2, axis=0))
        dx = dx + jnp.dot(
            sd(dz2), sd(w_val.T), preferred_element_type=f32
        ).reshape(tb, s, h)

    dx_ref[:] = dx.astype(dx_ref.dtype)


def _specs(s: int, h: int, i_dim: int, block: int):
    def tile(shape):
        return pl.BlockSpec(
            (block,) + shape,
            lambda idx: (idx,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def const(shape):
        return pl.BlockSpec(
            shape, lambda idx: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    data = [
        tile((s, h)),  # x
        tile((1, s)),  # mask
        tile((s, s)),  # m1
        tile((s, s)),  # m2
        tile((s, h)),  # d1
        tile((s, h)),  # d2
    ]
    params = [
        const((h, h)), const((h,)),  # wq, bq
        const((h, h)), const((h,)),  # wk, bk
        const((h, h)), const((h,)),  # wv, bv
        const((h, h)), const((h,)),  # wc, bc
        const((h, h)), const((h,)),  # wo, bo
        const((h,)), const((h,)),  # ln1
        const((h, i_dim)), const((i_dim,)),  # wi, bi
        const((i_dim, h)), const((h,)),  # w2, b2
        const((h,)), const((h,)),  # ln2
    ]
    return data, params, tile, const


def _pad_batch(arrs, block):
    b = arrs[0].shape[0]
    pad = (-b) % block
    if pad:
        arrs = [
            jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in arrs
        ]
    return arrs, b


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_layer(x, mask, masks, params: LayerParams, _unused1, _unused2,
                beta, keep, use_dropout, eps):
    return _fused_forward(
        x, mask, masks, params, beta=beta, keep=keep,
        use_dropout=use_dropout, eps=eps,
    )


def _fused_forward(x, mask, masks, params, *, beta, keep, use_dropout, eps):
    m1, m2, d1, d2 = masks
    s, h = x.shape[1], x.shape[2]
    i_dim = params.wi.shape[1]
    (x_p, mask_p, m1_p, m2_p, d1_p, d2_p), b = _pad_batch(
        [x, mask, m1, m2, d1, d2], BLOCK_FWD
    )
    grid = (x_p.shape[0] // BLOCK_FWD,)
    data_specs, param_specs, tile, _ = _specs(s, h, i_dim, BLOCK_FWD)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, beta=beta, keep=keep, use_dropout=use_dropout, eps=eps
        ),
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=data_specs + param_specs,
        out_specs=tile((s, h)),
        out_shape=jax.ShapeDtypeStruct(x_p.shape, x.dtype),
    )(x_p, mask_p, m1_p, m2_p, d1_p, d2_p, *params)
    return out[:b]


def _fused_fwd_rule(x, mask, masks, params, u1, u2, beta, keep, use_dropout, eps):
    out = _fused_forward(
        x, mask, masks, params, beta=beta, keep=keep,
        use_dropout=use_dropout, eps=eps,
    )
    return out, (x, mask, masks, params)


def _fused_bwd_rule(beta, keep, use_dropout, eps, residuals, g):
    x, mask, masks, params = residuals
    m1, m2, d1, d2 = masks
    s, h = x.shape[1], x.shape[2]
    i_dim = params.wi.shape[1]
    (x_p, mask_p, m1_p, m2_p, d1_p, d2_p, g_p), b = _pad_batch(
        [x, mask, m1, m2, d1, d2, g], BLOCK_BWD
    )
    grid = (x_p.shape[0] // BLOCK_BWD,)
    data_specs, param_specs, tile, const = _specs(s, h, i_dim, BLOCK_BWD)

    f32 = jnp.float32
    grad_shapes = (
        jax.ShapeDtypeStruct(x_p.shape, x.dtype),  # dx
        jax.ShapeDtypeStruct((h, h), f32), jax.ShapeDtypeStruct((h,), f32),
        jax.ShapeDtypeStruct((h, h), f32), jax.ShapeDtypeStruct((h,), f32),
        jax.ShapeDtypeStruct((h, h), f32), jax.ShapeDtypeStruct((h,), f32),
        jax.ShapeDtypeStruct((h, h), f32), jax.ShapeDtypeStruct((h,), f32),
        jax.ShapeDtypeStruct((h, h), f32), jax.ShapeDtypeStruct((h,), f32),
        jax.ShapeDtypeStruct((h,), f32), jax.ShapeDtypeStruct((h,), f32),
        jax.ShapeDtypeStruct((h, i_dim), f32), jax.ShapeDtypeStruct((i_dim,), f32),
        jax.ShapeDtypeStruct((i_dim, h), f32), jax.ShapeDtypeStruct((h,), f32),
        jax.ShapeDtypeStruct((h,), f32), jax.ShapeDtypeStruct((h,), f32),
    )
    grad_specs = (
        tile((s, h)),
        const((h, h)), const((h,)),
        const((h, h)), const((h,)),
        const((h, h)), const((h,)),
        const((h, h)), const((h,)),
        const((h, h)), const((h,)),
        const((h,)), const((h,)),
        const((h, i_dim)), const((i_dim,)),
        const((i_dim, h)), const((h,)),
        const((h,)), const((h,)),
    )
    store_dtype = (
        jnp.bfloat16
        if os.environ.get("PMGT_FUSED_BWD_DTYPE", "f32") in ("bf16", "bfloat16")
        else jnp.float32
    )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, beta=beta, keep=keep, use_dropout=use_dropout,
            eps=eps, store_dtype=store_dtype,
        ),
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=data_specs + param_specs + [tile((s, h))],
        out_specs=grad_specs,
        out_shape=grad_shapes,
    )(x_p, mask_p, m1_p, m2_p, d1_p, d2_p, *params, g_p)

    dx = outs[0][:b]
    dparams = LayerParams(
        *(o.astype(p.dtype) for o, p in zip(outs[1:], params))
    )
    return dx, None, None, dparams, None, None


fused_layer.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def pmgt_layer_fused(
    x: jax.Array,  # [B, S, H]
    additive_mask: Optional[jax.Array],  # [B, 1, 1, S] or None
    params: LayerParams,
    *,
    beta: float,
    dropout_rate: float,
    attention_dropout_rate: float,
    deterministic: bool,
    dropout_rng: Optional[jax.Array],
    eps: float,
) -> jax.Array:
    """Apply one fused PMGT layer. Dropout masks are sampled here (outside
    the kernels) so forward and recomputed-backward agree."""
    b, s, h = x.shape
    if additive_mask is not None:
        mask = additive_mask.reshape(b, 1, s)
    else:
        mask = jnp.zeros((b, 1, s), x.dtype)

    use_dropout = (not deterministic) and (
        dropout_rate > 0.0 or attention_dropout_rate > 0.0
    )
    keep = 1.0 - dropout_rate
    attn_keep = 1.0 - attention_dropout_rate
    if use_dropout:
        r1, r2, r3, r4 = jax.random.split(dropout_rng, 4)
        m1 = jax.random.bernoulli(r1, attn_keep, (b, s, s))
        m2 = jax.random.bernoulli(r2, attn_keep, (b, s, s))
        d1 = jax.random.bernoulli(r3, keep, (b, s, h))
        d2 = jax.random.bernoulli(r4, keep, (b, s, h))
    else:
        m1 = m2 = jnp.ones((b, s, s), jnp.bool_)
        d1 = d2 = jnp.ones((b, s, h), jnp.bool_)

    # NOTE: the kernel uses one keep rate for attention-prob dropout and
    # hidden dropout scaling; PMGT's defaults set both to the same value
    # (0.1). Distinct rates fall back to the per-op path in models/pmgt.py.
    return fused_layer(
        x, mask, (m1, m2, d1, d2), params, None, None,
        float(beta), float(keep), use_dropout, float(eps),
    )
