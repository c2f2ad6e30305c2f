"""Fused semantic-grouping kernel (Pallas TPU).

The grouping bottleneck is SegCLIP's signature op: per batch item,
  logits = q · kᵀ                    (G, L) un-scaled
  y      = softmax over G            (+ Gumbel/tau when training)
  hard   = one-hot(argmax_G y)       straight-through
  out    = (hard @ v) / max(Σ_L hard, 1)
XLA runs this as ~8 kernels with (B, G, L) round-trips to HBM; here it is
one VMEM pass per batch item producing (out, hard, soft). Gumbel noise is
drawn inside the kernel from the TPU PRNG (pltpu.prng_*), seeded per batch
item from a scalar-prefetch seed.

This kernel is forward-only (no custom_vjp): SemanticLearner uses it for
the deterministic eval path; training differentiates through the jnp path
in ops/grouping.py (straight-through estimator under autodiff).

L and D are padded to lane multiples; padded patch columns are masked to
-inf before the softmax so they never win an assignment.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, q_ref, k_ref, v_ref, out_ref, hard_ref, soft_ref, *,
            tau: float, training: bool, l_real: int, g_real: int):
    b = pl.program_id(0)

    q = q_ref[0].astype(jnp.float32)               # (G, D)
    k = k_ref[0].astype(jnp.float32)               # (Lp, D)
    v = v_ref[0]                                   # (Lp, D)
    gp, lp = q.shape[0], k.shape[0]

    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (G,Lp)

    col = jax.lax.broadcasted_iota(jnp.int32, (gp, lp), 1)
    grow = jax.lax.broadcasted_iota(jnp.int32, (gp, lp), 0)
    valid = col < l_real
    # padded group rows must never win the per-patch softmax/argmax
    logits = jnp.where(grow < g_real, logits, -1e30)

    if training:
        pltpu.prng_seed(seed_ref[0] + b)
        bits = pltpu.prng_random_bits((gp, lp))
        # uniform in (0,1): set exponent to 1.0..2.0 via mantissa bits
        mant = jax.lax.shift_right_logical(
            pltpu.bitcast(bits, jnp.uint32), jnp.uint32(9))
        u = pltpu.bitcast(mant | jnp.uint32(0x3F800000), jnp.float32) - 1.0
        u = jnp.clip(u, 1e-20, 1.0 - 1e-7)
        gumbel = -jnp.log(-jnp.log(u))
        y_logits = (logits + gumbel) / tau
    else:
        y_logits = logits

    # softmax over the GROUP axis (axis 0) per patch column
    m = jnp.max(y_logits, axis=0, keepdims=True)
    e = jnp.exp(y_logits - m)
    y_soft = e / jnp.sum(e, axis=0, keepdims=True)

    ms = jnp.max(logits, axis=0, keepdims=True)
    es = jnp.exp(logits - ms)
    soft = es / jnp.sum(es, axis=0, keepdims=True)

    # hard one-hot over groups (ties: lowest index, matching argmax)
    winner = jnp.max(y_soft, axis=0, keepdims=True)
    is_max = (y_soft == winner).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (gp, lp), 0)
    first = jnp.min(jnp.where(is_max > 0, row, gp), axis=0, keepdims=True)
    hard = ((row == first) & valid).astype(jnp.float32)

    counts = jnp.sum(hard, axis=1, keepdims=True)           # (G, 1)
    agg = jnp.dot(hard.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)       # (G, D)
    out = agg / jnp.maximum(counts, 1.0)

    out_ref[0] = out.astype(out_ref.dtype)
    hard_ref[0] = jnp.where(valid, hard, 0.0).astype(hard_ref.dtype)
    soft_ref[0] = jnp.where(valid, soft, 0.0).astype(soft_ref.dtype)


def _pad_lane(x: jax.Array, axis: int, mult: int = 128) -> jax.Array:
    size = x.shape[axis]
    target = -(-size // mult) * mult
    if target == size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - size)
    return jnp.pad(x, widths)


def fused_group_assign(q: jax.Array, k: jax.Array, v: jax.Array,
                       tau: float = 0.9, training: bool = False,
                       seed: Optional[jax.Array] = None,
                       interpret: Optional[bool] = None
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """q: (B, G, D); k, v: (B, L, D) → (grouped (B,G,D), hard (B,G,L),
    soft (B,G,L)). `seed` (int32 scalar) required when training."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if training and interpret:
        # pltpu PRNG has no CPU-interpret lowering; use the reference jnp
        # path with a key derived from the seed (same distribution).
        from segclip_tpu.ops.grouping import group_assign_aggregate
        logits = jnp.einsum("bgd,bld->bgl", q, k,
                            preferred_element_type=jnp.float32)
        key = jax.random.key(jnp.asarray(seed, jnp.int32))
        return group_assign_aggregate(logits, v, tau=tau, key=key,
                                      training=True)
    b, g, d = q.shape
    l = k.shape[1]
    gp = max(8, -(-g // 8) * 8)
    kp = _pad_lane(k, 1)
    vp = _pad_lane(v, 1)
    qp = jnp.pad(q, ((0, 0), (0, gp - g), (0, 0)))
    lp = kp.shape[1]

    if seed is None:
        if training:
            raise ValueError("fused_group_assign(training=True) needs seed")
        seed = jnp.zeros((), jnp.int32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    kernel = functools.partial(_kernel, tau=tau, training=training,
                               l_real=l, g_real=g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, gp, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, gp, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gp, lp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gp, lp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out, hard, soft = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, gp, d), v.dtype),
            jax.ShapeDtypeStruct((b, gp, lp), jnp.float32),
            jax.ShapeDtypeStruct((b, gp, lp), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr, qp, kp, vp)
    return out[:, :g, :], hard[:, :g, :l], soft[:, :g, :l]
