"""Fused attention kernel (Pallas TPU).

One VMEM-resident pass per (batch, head): logits → additive bias → stable
softmax → weighted values, with fp32 accumulation. At SegCLIP's sequence
lengths (≤ 256 after padding) the whole score matrix fits in VMEM, so this
is a single-block fused kernel rather than a tiled streaming flash loop —
the win over XLA is keeping the L×L scores out of HBM and fusing the
softmax chain.

Differentiation: custom_vjp with an XLA-math backward (standard attention
gradients); the forward fused kernel is the hot path (the backward is
already well-fused by XLA at these sizes).

Falls back to interpret mode off-TPU so CPU tests exercise the same code.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x: jax.Array, axis: int, size: int, value=0.0) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)          # (Lq, D)
    k = k_ref[0, 0].astype(jnp.float32)          # (Lk, D)
    v = v_ref[0, 0]                              # (Lk, D)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0, 0].astype(jnp.float32)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)

    o_ref[0, 0] = jnp.dot(p, v,
                          preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _forward(q, k, v, bias, interpret: bool):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lq_p = max(128, -(-lq // 128) * 128)
    lk_p = max(128, -(-lk // 128) * 128)

    qp = _pad_to(q, 2, lq_p)
    kp = _pad_to(k, 2, lk_p)
    vp = _pad_to(v, 2, lk_p)

    # Canonical additive bias (B_b, 1, Lq_p, Lk_p), padded kv masked out.
    if bias is None:
        bias_full = jnp.zeros((1, 1, lq_p, lk_p), jnp.float32)
    else:
        if bias.ndim == 2:                      # (Lq, Lk) e.g. causal
            bias = bias[None, None]
        bias_full = jnp.broadcast_to(
            bias.astype(jnp.float32), (bias.shape[0], 1, lq, lk))
        bias_full = _pad_to(_pad_to(bias_full, 3, lk_p), 2, lq_p)
    if lk_p > lk:
        pad_mask = (jnp.arange(lk_p) >= lk) * jnp.float32(-1e30)
        bias_full = bias_full + pad_mask[None, None, None, :]
    # -inf rows (fully-masked queries) would produce NaN; clamp to -1e30.
    bias_full = jnp.maximum(bias_full, -1e30)
    bias_b = bias_full.shape[0]

    scale = d ** -0.5
    kernel = functools.partial(_attn_kernel, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, lq_p, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk_p, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk_p, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lq_p, lk_p),
                         (lambda i, j: (i, 0, 0, 0)) if bias_b > 1
                         else (lambda i, j: (0, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, lq_p, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, d), v.dtype),
        interpret=interpret,
    )(qp, kp, vp, bias_full)
    return out[:, :, :lq, :]


def _xla_attention(q, k, v, bias):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array] = None) -> jax.Array:
    """q,k,v: (B, H, L, D); bias: additive, broadcastable to (B,1,Lq,Lk)."""
    interpret = jax.default_backend() != "tpu"
    return _forward(q, k, v, bias, interpret)


def _fwd(q, k, v, bias):
    return flash_attention(q, k, v, bias), (q, k, v, bias)


def _bwd(res, g):
    q, k, v, bias = res
    # XLA-math attention backward (recompute probabilities).
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + jnp.maximum(bias.astype(jnp.float32), -1e30)
    p = jax.nn.softmax(s, axis=-1)

    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32).astype(v.dtype)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32))
          * scale).astype(q.dtype)
    dk = (jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32))
          * scale).astype(k.dtype)
    dbias = None
    if bias is not None:
        shape4 = (1,) * (4 - bias.ndim) + bias.shape
        db = ds
        # reduce over broadcast axes back to bias's (canonicalized) shape
        for axis in range(4):
            if shape4[axis] == 1 and db.shape[axis] != 1:
                db = jnp.sum(db, axis=axis, keepdims=True)
        dbias = db.reshape(bias.shape).astype(bias.dtype)
    return dq, dk, dv, dbias


flash_attention.defvjp(_fwd, _bwd)
