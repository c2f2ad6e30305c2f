"""Fused semantic-grouping kernel (Pallas TPU).

The grouping bottleneck is SegCLIP's signature op: per batch item,
  logits = q · kᵀ                    (G, L) un-scaled
  y      = softmax over G            (+ Gumbel/tau when training)
  hard   = one-hot(argmax_G y)       straight-through
  out    = (hard @ v) / max(Σ_L hard, 1)
XLA runs this as ~8 kernels with (B, G, L) round-trips to HBM; here it is
one VMEM pass per batch item producing (out, hard, soft[, y_soft]).

`fused_group_assign_st` is the trainable variant: a custom_vjp whose
forward is this kernel (Gumbel noise passed in, drawn with
jax.random.gumbel exactly like the jnp path) and whose backward is the
hand-derived VJP of the straight-through estimator (ops/grouping.py
semantics: hard's cotangent flows to the noised softmax, the count
normalizer max(c, 1) passes gradient 1/0.5/0 for c>1 / c==1 / c<1,
matching jnp.maximum). Values and gradients equal the jnp path exactly at
f32 (tests/test_pallas.py); at bf16 the two paths round matmuls slightly
differently, so long trajectories are equivalent in distribution, not
bitwise. Eval uses `fused_group_assign` (deterministic, no noise),
bit-equal to the jnp path. Training defaults to jnp — the full-step A/B is
a wash (docs/PERF.md) — select grouping_impl="pallas" to opt in.

L and D are padded to lane multiples. Masking scheme: padded GROUP rows
are set to -1e30 before the softmax (they must never win a per-patch
argmax); padded PATCH columns keep live logits through the softmax and
are excluded afterwards — `valid` zeroes their hard/soft outputs and the
`hard & valid` mask keeps them out of counts and aggregation. Do not
reuse in-kernel softmax values for padded columns.

Reference math: module_seg_vit.py:221-242 (gumbel_softmax) + 304-310
(assign/aggregate).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, noise_ref, out_ref, hard_ref, soft_ref,
            ysoft_ref, *, tau: float, training: bool, l_real: int,
            g_real: int):
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
        y_logits = (logits + noise_ref[0].astype(jnp.float32)) / tau
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
    ysoft_ref[0] = jnp.where(valid, y_soft, 0.0).astype(ysoft_ref.dtype)


def _pad_lane(x: jax.Array, axis: int, mult: int = 128) -> jax.Array:
    size = x.shape[axis]
    target = -(-size // mult) * mult
    if target == size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - size)
    return jnp.pad(x, widths)


def _call_kernel(q, k, v, noise, tau: float, training: bool,
                 interpret: bool):
    b, g, d = q.shape
    l = k.shape[1]
    gp = max(8, -(-g // 8) * 8)
    kp = _pad_lane(k, 1)
    vp = _pad_lane(v, 1)
    qp = jnp.pad(q, ((0, 0), (0, gp - g), (0, 0)))
    lp = kp.shape[1]
    np_ = jnp.pad(noise.astype(jnp.float32),
                  ((0, 0), (0, gp - g), (0, lp - l)))

    kernel = functools.partial(_kernel, tau=tau, training=training,
                               l_real=l, g_real=g)
    spec_gd = pl.BlockSpec((1, gp, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_ld = pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_gl = pl.BlockSpec((1, gp, lp), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out, hard, soft, y_soft = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec_gd, spec_ld, spec_ld, spec_gl],
        out_specs=[spec_gd, spec_gl, spec_gl, spec_gl],
        out_shape=[
            jax.ShapeDtypeStruct((b, gp, d), v.dtype),
            jax.ShapeDtypeStruct((b, gp, lp), jnp.float32),
            jax.ShapeDtypeStruct((b, gp, lp), jnp.float32),
            jax.ShapeDtypeStruct((b, gp, lp), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, np_)
    return (out[:, :g, :], hard[:, :g, :l], soft[:, :g, :l],
            y_soft[:, :g, :l])


def fused_group_assign(q: jax.Array, k: jax.Array, v: jax.Array,
                       tau: float = 0.9, training: bool = False,
                       seed=None, interpret: Optional[bool] = None
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Deterministic (eval) fused grouping. q: (B, G, D); k, v: (B, L, D) →
    (grouped (B,G,D), hard (B,G,L), soft (B,G,L)). For training use
    fused_group_assign_st (differentiable, external Gumbel noise)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if training:
        raise ValueError("training=True: use fused_group_assign_st with "
                         "explicit Gumbel noise")
    zeros = jnp.zeros((q.shape[0], q.shape[1], k.shape[1]), jnp.float32)
    out, hard, soft, _ = _call_kernel(q, k, v, zeros, tau, False, interpret)
    return out, hard, soft


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_group_assign_st(q, k, v, noise, tau: float = 0.9,
                          interpret: bool = False):
    """Straight-through fused grouping for TRAINING.

    noise: Gumbel(0,1) of shape (B, G, L) — draw with
    jax.random.gumbel(key, (B, G, L)) so trajectories match the jnp path
    exactly. Returns (grouped, hard, soft); gradients match autodiff
    through ops/grouping.group_assign_aggregate (STE: hard's cotangent
    flows through the noised softmax)."""
    out, hard, soft, _ = _call_kernel(q, k, v, noise, tau, True, interpret)
    return out, hard, soft


def _st_fwd(q, k, v, noise, tau, interpret):
    out, hard, soft, y_soft = _call_kernel(q, k, v, noise, tau, True,
                                           interpret)
    return (out, hard, soft), (q, k, v, hard, soft, y_soft, out)


def _st_bwd(tau, interpret, res, cots):
    q, k, v, hard, soft, y_soft, out = res
    d_out, d_hard, d_soft = cots
    f32 = jnp.float32
    hard32 = hard.astype(f32)
    v32 = v.astype(f32)
    out32 = out.astype(f32)
    d_out32 = d_out.astype(f32)

    c = jnp.sum(hard32, axis=-1, keepdims=True)             # (B,G,1)
    n = jnp.maximum(c, 1.0)

    g_bar = d_out32 / n                                     # d(out)/d(agg)
    # max(c,1) subgradient matching jnp.maximum: 1 / 0.5 / 0
    dmax = jnp.where(c > 1.0, 1.0, jnp.where(c == 1.0, 0.5, 0.0))
    c_bar = -jnp.sum(d_out32 * out32, axis=-1, keepdims=True) / n * dmax

    hard_bar = (d_hard.astype(f32)
                + jnp.einsum("bgd,bld->bgl", g_bar, v32)
                + c_bar)                                    # (B,G,L)
    v_bar = jnp.einsum("bgl,bgd->bld", hard32, g_bar)

    # STE: hard's cotangent flows to the noised softmax y_soft
    z_bar = (hard_bar - jnp.sum(hard_bar * y_soft, axis=1,
                                keepdims=True)) * y_soft
    l_bar = z_bar / tau
    # plain-softmax output path
    s = d_soft.astype(f32)
    l_bar = l_bar + (s - jnp.sum(s * soft, axis=1, keepdims=True)) * soft

    q_bar = jnp.einsum("bgl,bld->bgd", l_bar, k.astype(f32))
    k_bar = jnp.einsum("bgl,bgd->bld", l_bar, q.astype(f32))
    return (q_bar.astype(q.dtype), k_bar.astype(k.dtype),
            v_bar.astype(v.dtype), jnp.zeros_like(y_soft))


fused_group_assign_st.defvjp(_st_fwd, _st_bwd)
