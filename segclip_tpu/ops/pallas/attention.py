"""Layout-preserving VMEM attention kernel (Pallas TPU).

Motivation (docs/PERF.md "Step profile"): at SegCLIP's sequence lengths
(≤257) XLA wins against STREAMING flash attention — the whole score matrix
fits in VMEM, so flash blocking only adds overhead (measured 0.47-0.72×,
rounds 1-2). What XLA does NOT eliminate is (a) ~21 ms/step of layout
copies around the attention head split/merge transposes and (b) HBM
round-trips for the (B, H, L, L) probability tensor between the softmax
and its consumers. This kernel attacks exactly those two:

  - operands stay in the model's natural (B, L, H·D) layout — no head
    transpose exists anywhere. TPU block tiling requires 128-lane-aligned
    slices, so each program owns a PAIR of 64-dim heads (one 128-wide
    lane panel; grid = (B, H/2)) and splits the pair with static lane
    slices inside VMEM;
  - one program computes scores → masked softmax → P·V entirely in VMEM;
    the probability matrix never touches HBM in the forward (training
    saves P once, bf16, for the hand-derived backward).

The backward kernel consumes the saved P and computes dQ/dK/dV per
(batch, head-pair) fully VMEM-resident (dV = PᵀdO; dP = dO Vᵀ;
dS = P∘(dP − rowsum(dP∘P)); dQ = dS·K·scale; dK = dSᵀ·Q·scale).

Masking: additive biases replicate ops/attention.py exactly — an optional
(Lq, Lk) bias (the causal mask) and an optional (B, Lk) bias (the padding
mask's −1e6 rows). Padded K columns get −1e30 pre-softmax (→ exact 0
probability); padded Q rows are zeroed in the SAVED P so they contribute
nothing to dK/dV.

Semantics parity: softmax in fp32, P cast to the value dtype for the P·V
dot, output in compute dtype — the same dtype chain as ops/attention.sdpa.
Supported head_dim: 64 (the CLIP towers; ViT-B/L and the text stack).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEAD_DIM = 64
PAIR = 2                       # heads per program: PAIR * HEAD_DIM = 128


def _pad_axis(x: jax.Array, axis: int, target: int) -> jax.Array:
    if x.shape[axis] == target:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, widths)


def _round_up(n: int, mult: int) -> int:
    return -(-n // mult) * mult


def _fwd_kernel(q_ref, k_ref, v_ref, bias2d_ref, biasb_ref, o_ref, p_ref,
                *, scale: float, l_real_k: int, l_real_q: int,
                save_p: bool):
    lq = q_ref.shape[1]
    lk = k_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)

    outs = []
    for s_idx in range(PAIR):
        lo, hi = s_idx * HEAD_DIM, (s_idx + 1) * HEAD_DIM
        q = q_ref[0, :, lo:hi].astype(jnp.float32)      # (Lq, D)
        k = k_ref[0, :, lo:hi].astype(jnp.float32)      # (Lk, D)
        v = v_ref[0, :, lo:hi]                          # (Lk, D)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias2d_ref is not None:
            s = s + bias2d_ref[...].astype(jnp.float32)
        if biasb_ref is not None:
            s = s + biasb_ref[0, 0][None, :].astype(jnp.float32)
        s = jnp.where(col < l_real_k, s, -1e30)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        o = jnp.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
        if save_p:
            p_ref[0, s_idx] = jnp.where(row < l_real_q, p, 0.0
                                        ).astype(p_ref.dtype)
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(p_ref, do_ref, q_ref, k_ref, v_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    dqs, dks, dvs = [], [], []
    for s_idx in range(PAIR):
        lo, hi = s_idx * HEAD_DIM, (s_idx + 1) * HEAD_DIM
        p = p_ref[0, s_idx].astype(jnp.float32)         # (Lq, Lk)
        do = do_ref[0, :, lo:hi].astype(jnp.float32)    # (Lq, D)
        q = q_ref[0, :, lo:hi].astype(jnp.float32)
        k = k_ref[0, :, lo:hi].astype(jnp.float32)
        v = v_ref[0, :, lo:hi].astype(jnp.float32)

        dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)
    dk_ref[0] = jnp.concatenate(dks, axis=-1)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1)


def _prep(q, k, v):
    """Pad (B, L, HD) operands: Q rows to sublane multiples, K/V rows to
    lane multiples (they become score-matrix columns)."""
    lq, lk = q.shape[1], k.shape[1]
    lqp = _round_up(max(lq, 8), 8)
    lkp = _round_up(max(lk, 128), 128)
    return (_pad_axis(q, 1, lqp), _pad_axis(k, 1, lkp),
            _pad_axis(v, 1, lkp), lqp, lkp)


def _panel_specs(lqp, lkp):
    """Block specs: one 128-lane head-pair panel per program."""
    q_spec = pl.BlockSpec((1, lqp, PAIR * HEAD_DIM),
                          lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, lkp, PAIR * HEAD_DIM),
                          lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, PAIR, lqp, lkp),
                          lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    return q_spec, k_spec, p_spec


def _call_fwd(q, k, v, bias2d, biasb, scale: float, save_p: bool,
              interpret: bool):
    b, lq, dm = q.shape
    lk = k.shape[1]
    n_pairs = dm // (PAIR * HEAD_DIM)
    qp, kp, vp, lqp, lkp = _prep(q, k, v)
    q_spec, k_spec, p_spec = _panel_specs(lqp, lkp)

    in_specs = [q_spec, k_spec, k_spec]
    args = [qp, kp, vp]
    if bias2d is not None:
        bias2d = _pad_axis(_pad_axis(
            bias2d.astype(jnp.float32), 0, lqp), 1, lkp)
        in_specs.append(pl.BlockSpec((lqp, lkp), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias2d)
    if biasb is not None:
        biasb = _pad_axis(biasb.astype(jnp.float32), 1, lkp)[:, None, :]
        in_specs.append(pl.BlockSpec((1, 1, lkp), lambda i, j: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(biasb)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, l_real_k=lk, l_real_q=lq, save_p=save_p)

    def wrapped(q_ref, k_ref, v_ref, *rest):
        idx = 0
        b2 = rest[idx] if bias2d is not None else None
        idx += bias2d is not None
        bb = rest[idx] if biasb is not None else None
        idx += biasb is not None
        outs = rest[idx:]
        kernel(q_ref, k_ref, v_ref, b2, bb, outs[0],
               outs[1] if save_p else None)

    out_shape = [jax.ShapeDtypeStruct((b, lqp, dm), v.dtype)]
    out_specs = [q_spec]
    if save_p:
        out_shape.append(jax.ShapeDtypeStruct(
            (b, PAIR * n_pairs, lqp, lkp), jnp.bfloat16))
        out_specs.append(p_spec)

    res = pl.pallas_call(
        wrapped, grid=(b, n_pairs), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(*args)
    o = res[0][:, :lq]
    return (o, res[1]) if save_p else (o, None)


def _call_bwd(p, do, q, k, v, scale: float, interpret: bool):
    b, lq, dm = q.shape
    lk = k.shape[1]
    n_pairs = dm // (PAIR * HEAD_DIM)
    qp, kp, vp, lqp, lkp = _prep(q, k, v)
    dop = _pad_axis(do, 1, lqp)
    q_spec, k_spec, p_spec = _panel_specs(lqp, lkp)

    kernel = functools.partial(_bwd_kernel, scale=scale)
    dq, dk, dv = pl.pallas_call(
        kernel, grid=(b, n_pairs),
        in_specs=[p_spec, q_spec, q_spec, k_spec, k_spec],
        out_specs=[q_spec, k_spec, k_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, lqp, dm), q.dtype),
            jax.ShapeDtypeStruct((b, lkp, dm), k.dtype),
            jax.ShapeDtypeStruct((b, lkp, dm), v.dtype),
        ],
        interpret=interpret,
    )(p, dop, qp, kp, vp)
    return dq[:, :lq], dk[:, :lk], dv[:, :lk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def attention_vmem(q, k, v, bias2d, biasb, scale: float,
                   interpret: bool = False):
    """Fused VMEM attention over (B, L, H·64) operands (no head transpose).

    bias2d: optional (Lq, Lk) additive bias (causal mask);
    biasb: optional (B, Lk) additive bias (padding-mask rows).
    The model dim must be a multiple of 128 (pairs of 64-dim heads).
    Returns (B, Lq, H·64) in v.dtype.
    """
    o, _ = _call_fwd(q, k, v, bias2d, biasb, scale, save_p=False,
                     interpret=interpret)
    return o


def _attn_fwd(q, k, v, bias2d, biasb, scale, interpret):
    o, p = _call_fwd(q, k, v, bias2d, biasb, scale, save_p=True,
                     interpret=interpret)
    return o, (p, q, k, v, bias2d, biasb)


def _attn_bwd(scale, interpret, res, do):
    p, q, k, v, bias2d, biasb = res
    dq, dk, dv = _call_bwd(p, do, q, k, v, scale, interpret)
    # masks are constants — zero cotangent (None when the operand was None)
    db2 = None if bias2d is None else jnp.zeros_like(bias2d)
    dbb = None if biasb is None else jnp.zeros_like(biasb)
    return dq, dk, dv, db2, dbb


attention_vmem.defvjp(_attn_fwd, _attn_bwd)
