"""Multi-head attention as a pure function over a packed-QKV param dict.

Semantics match torch nn.MultiheadAttention as used by the reference
(module_clip_ttransformer.py:20-52, module_seg_vit.py:162-218):
  - packed in-projection: one (d, 3d) kernel producing q|k|v,
  - q scaled by head_dim**-0.5 before logits,
  - additive float mask (causal: -inf above diagonal; padding: (1-m)*-1e6),
  - softmax in fp32, output projection back to d.

Layout note: kernels are stored (in_features, out_features) — the natural
layout for `x @ W` on the MXU. The torch converter transposes.

`impl` selects the softmax(qk)v implementation. Only "xla" exists: a
hand-written Pallas flash-attention kernel was measured 0.47-0.72× XLA at
SegCLIP's sequence lengths (≤256 — the whole score matrix fits in VMEM and
XLA already fuses the softmax chain) and was removed; the decision and
numbers are recorded in docs/PERF.md "Attention kernel selection". The
Pallas investment lives where it wins: the fused grouping kernel
(ops/pallas/grouping.py), on both eval and training paths.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask: 0 on/below diagonal, -inf above.

    Matches reference CLIP_Module.build_attention_mask
    (module_clip_util.py:199-205).
    """
    mask = jnp.full((length, length), -jnp.inf, dtype=dtype)
    return jnp.triu(mask, k=1)


def padding_bias(attention_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Additive padding bias from a {0,1} mask of shape (B, L).

    Matches the reference expansion (module_clip_ttransformer.py:38-41):
    (1 - mask) * -1e6, broadcast over query positions → (B, 1, 1, L).
    """
    bias = (1.0 - attention_mask.astype(dtype)) * -1e6
    return bias[:, None, None, :]


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
         bias: Optional[jax.Array] = None, impl: str = "xla") -> jax.Array:
    """softmax(q kᵀ / sqrt(d) + bias) v over (B, H, L, Dh) tensors."""
    if impl != "xla":
        raise ValueError(
            f"attention impl {impl!r} removed — XLA wins at SegCLIP's "
            f"sequence lengths (docs/PERF.md, 'Attention kernel selection')")
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def multi_head_attention(params: dict, q_in: jax.Array, kv_in: jax.Array,
                         num_heads: int, bias: Optional[jax.Array] = None,
                         impl: str = "xla",
                         compute_dtype=jnp.bfloat16) -> jax.Array:
    """Packed-projection MHA. `params` holds:
      qkv/kernel (d, 3d), qkv/bias (3d,), out/kernel (d, d), out/bias (d,).

    Self-attention when q_in is kv_in; cross-attention otherwise (the packed
    kernel is column-sliced into Wq|Wk|Wv, matching torch's in_proj split).
    """
    d = q_in.shape[-1]
    wqkv = params["qkv"]["kernel"].astype(compute_dtype)
    bqkv = params["qkv"]["bias"].astype(compute_dtype)
    q_in = q_in.astype(compute_dtype)
    kv_in = kv_in.astype(compute_dtype)

    if q_in is kv_in:
        qkv = q_in @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = q_in @ wqkv[:, :d] + bqkv[:d]
        kv = kv_in @ wqkv[:, d:] + bqkv[d:]
        k, v = jnp.split(kv, 2, axis=-1)

    if impl == "pallas_vmem":
        o = _sdpa_pallas_vmem(q, k, v, num_heads, bias)
    else:
        o = _merge_heads(sdpa(_split_heads(q, num_heads),
                              _split_heads(k, num_heads),
                              _split_heads(v, num_heads),
                              bias=bias, impl=impl))
    wout = params["out"]["kernel"].astype(compute_dtype)
    bout = params["out"]["bias"].astype(compute_dtype)
    return o @ wout + bout


def _sdpa_pallas_vmem(q: jax.Array, k: jax.Array, v: jax.Array,
                      num_heads: int,
                      bias: Optional[jax.Array]) -> jax.Array:
    """Fused VMEM attention in the natural (B, L, H·D) layout — no head
    transpose anywhere (ops/pallas/attention.py). Accepts the same bias
    forms as sdpa: None, a (Lq, Lk) causal mask, or a (B, 1, 1, Lk)
    padding bias. Falls back to the XLA path when head_dim ≠ 64 (the MAE
    decoders' 32/48-dim heads — TPU lane tiling wants 128-wide head-pair
    panels)."""
    d = q.shape[-1]
    hd = d // num_heads
    if hd != 64 or num_heads % 2:
        return _merge_heads(sdpa(_split_heads(q, num_heads),
                                 _split_heads(k, num_heads),
                                 _split_heads(v, num_heads),
                                 bias=bias, impl="xla"))
    from segclip_tpu.ops.pallas.attention import attention_vmem
    bias2d = biasb = None
    if bias is not None:
        if bias.ndim == 2:
            bias2d = bias
        elif bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1:
            biasb = bias[:, 0, 0, :]
        else:
            raise ValueError(f"unsupported bias shape {bias.shape} "
                             f"for pallas_vmem attention")
    interpret = jax.default_backend() != "tpu"
    return attention_vmem(q, k, v, bias2d, biasb, hd ** -0.5, interpret)
