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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 256  # batch-lane rows per grid step (forward)
BLOCK_B_BWD = 128  # backward holds more f32 intermediates in VMEM


def _kernel(q_ref, k_ref, v_ref, c_ref, mask_ref, m1_ref, m2_ref, out_ref,
            *, beta: float, keep: float, use_dropout: bool):
    q = q_ref[:]  # [TB, S, d]
    k = k_ref[:]
    v = v_ref[:]
    c = c_ref[:]
    add_mask = mask_ref[:]  # [TB, 1, S]

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
    cf = c.astype(f32)
    norm_sq = jnp.sum(cf * cf, axis=-1, keepdims=True)  # [TB, S, 1]
    norm = jnp.sqrt(norm_sq)
    norm_outer = jax.lax.dot_general(
        norm, norm,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # [TB, S, S]
    cos = bmm_nt(cf, cf) / jnp.maximum(norm_outer, 1e-12)
    eye = jnp.eye(s, dtype=f32)[None]
    s1 = 1.0 - cos + eye + add_mask
    s1 = s1 - jnp.max(s1, axis=-1, keepdims=True)
    e1 = jnp.exp(s1)
    p1 = e1 / jnp.sum(e1, axis=-1, keepdims=True)

    # --- standard scaled dot-product scores ---
    s2 = bmm_nt(q.astype(f32), k.astype(f32)) * (1.0 / (d ** 0.5)) + add_mask
    s2 = s2 - jnp.max(s2, axis=-1, keepdims=True)
    e2 = jnp.exp(s2)
    p2 = e2 / jnp.sum(e2, axis=-1, keepdims=True)

    if use_dropout:
        inv_keep = 1.0 / keep
        p1 = p1 * m1_ref[:].astype(f32) * inv_keep
        p2 = p2 * m2_ref[:].astype(f32) * inv_keep

    probs = beta * p1 + (1.0 - beta) * p2  # [TB, S, S]
    out = jax.lax.dot_general(
        probs, v.astype(f32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
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


def _bwd_kernel(q_ref, k_ref, v_ref, c_ref, mask_ref, m1_ref, m2_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dc_ref,
                *, beta: float, keep: float, use_dropout: bool):
    """Backward pass: recomputes the forward internals in VMEM, then
    applies the chain rule for both attention distributions, including the
    cosine-similarity term."""
    f32 = jnp.float32
    q = q_ref[:].astype(f32)
    k = k_ref[:].astype(f32)
    v = v_ref[:].astype(f32)
    c = c_ref[:].astype(f32)
    add_mask = mask_ref[:].astype(f32)  # [TB, 1, S]
    g = g_ref[:].astype(f32)  # [TB, S, d]

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
        m1 = m1_ref[:].astype(f32) * inv_keep
        m2 = m2_ref[:].astype(f32) * inv_keep
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
        r1, r2 = jax.random.split(dropout_rng)
        m1 = jax.random.bernoulli(r1, keep, (b * h, s, s))
        m2 = jax.random.bernoulli(r2, keep, (b * h, s, s))
    else:
        m1 = jnp.ones((b * h, s, s), jnp.bool_)
        m2 = m1

    out = _fused(q, k, v, c, mask, m1, m2, float(beta), float(keep), use_dropout)
    return out.reshape(b, h, s, d)
