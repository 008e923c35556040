"""Pallas slot-selection kernel for the packed16 alias-draw path.

The exact-mode (per-occurrence sampling) device step's last named lever
(ROADMAP, round 4 "CLOSED WITH EVIDENCE"): XLA implements the one-hot
slot selection over the gathered draw rows by first paying a relayout
copy of the whole [B, F, 2D+1] buffer (s32[5120,128,61]{2,1,0} →
{1,0,2}; 0.73 ms at ~53% transpose efficiency at TG scale) so every
subsequent one-hot pass runs full-lane. A Pallas kernel dodges the copy
structurally: the row gather writes lanes-minor ({2,1,0}), which IS the
dense layout a Pallas operand demands, and the kernel consumes the
buffer in ONE read — slot computation, two one-hot lane selections
(packed id pair + acceptance-probability bits), 16-bit decode, and the
accept/alias choice all happen in VMEM, emitting only the tiny
[rows, num] sampled-id block.

Bit-identical to the XLA formulation in sampling/mcn.py `_alias_draw`
(packed16 branch): same f32 slot/frac arithmetic, exact one-hot
selection, same logical-shift decode (tests/test_sampling.py asserts
equality in interpret mode).

Gated off by default (`SELECT_IMPL = "xla"` until an interleaved A/B on
real hardware says otherwise — round 4's where-chain variant of the
same idea measured +6.2 ms WORSE, so the bar is evidence, not theory).
Reference behavior being accelerated: uoo723/PMGT pmgt/pmgt/datasets.py
14-53 (random_walk_with_restart neighbor draws).
"""
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# "xla" | "pallas". Env override for A/B harnesses
# (tools/ab_step.py --b-select-impl).
SELECT_IMPL = os.environ.get("PMGT_TPU_SELECT_IMPL", "xla")

BLOCK_R = 1024  # gathered draw rows per grid step


def _kernel(rows_ref, u_ref, out_ref, *, d):
    rows = rows_ref[:]  # [R, W] int32, W = 2d+1: id pairs | prob bits | deg
    u = u_ref[:]  # [R, num] f32
    num = u.shape[-1]
    w = rows.shape[-1]

    deg = jnp.maximum(rows[:, 2 * d : 2 * d + 1], 1)  # [R, 1] int32
    degf = deg.astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)  # [1, W]

    for j in range(num):  # num is small and static (hop sample size)
        uj = u[:, j : j + 1]  # [R, 1]
        scaled = uj * degf
        slot = jnp.minimum(scaled.astype(jnp.int32), deg - 1)  # [R, 1]
        frac = scaled - slot.astype(scaled.dtype)
        sel_pair = (lane == slot).astype(jnp.int32)  # [R, W] one-hot
        sel_prob = (lane == slot + d).astype(jnp.int32)
        pair = jnp.sum(rows * sel_pair, axis=1, keepdims=True)  # [R, 1]
        prob_bits = jnp.sum(rows * sel_prob, axis=1, keepdims=True)
        prob = jax.lax.bitcast_convert_type(prob_bits, jnp.float32)
        primary = pair & 0xFFFF
        alias = jax.lax.shift_right_logical(pair, 16)
        out_ref[:, j : j + 1] = jnp.where(frac < prob, primary, alias)


@functools.partial(jax.jit, static_argnames=("d",))
def select_sampled_packed16(rows: jnp.ndarray, u: jnp.ndarray, *, d: int):
    """rows: [R, 2d+1] int32 gathered packed16 draw rows; u: [R, num] f32
    → [R, num] int32 sampled neighbor ids (accept→primary else alias)."""
    r, w = rows.shape
    num = u.shape[-1]
    pad = (-r) % BLOCK_R
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        u = jnp.pad(u, ((0, pad), (0, 0)))
    rp = rows.shape[0]

    def spec(cols):
        return pl.BlockSpec(
            (BLOCK_R, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(_kernel, d=d),
        interpret=jax.default_backend() != "tpu",
        grid=(rp // BLOCK_R,),
        in_specs=[spec(w), spec(num)],
        out_specs=spec(num),
        out_shape=jax.ShapeDtypeStruct((rp, num), jnp.int32),
    )(rows, u)
    return out[:r]
