"""Shared flax.linen building blocks.

Conventions:
  - parameters are stored fp32 (`param_dtype`), activations/matmuls run in
    `compute_dtype` (bf16 by default), LayerNorm always computes fp32
    (reference module_clip_util.py:126-132);
  - attention uses a packed (d, 3d) QKV kernel (torch MultiheadAttention
    in-proj layout, transposed to x@W form);
  - initializers mirror the reference: trunc_normal(0.02) for new Linear
    weights / zeros bias (module_seg_vit.py:394-401), CLIP-scaled normals for
    the text tower (module_clip.py:162-178).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from segclip_tpu.ops.attention import multi_head_attention
from segclip_tpu.ops.layers import layer_norm, quick_gelu

trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0,
                                                   upper=2.0)


class LayerNormFP32(nn.Module):
    """LayerNorm with fp32 internals regardless of activation dtype."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return layer_norm(x, scale, bias, eps=self.eps)


class MHAttention(nn.Module):
    """Packed-QKV multi-head attention (self or cross)."""
    width: int
    heads: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    impl: str = "xla"
    kernel_init: Callable = trunc_normal_02

    @nn.compact
    def __call__(self, q_in: jax.Array, kv_in: Optional[jax.Array] = None,
                 bias: Optional[jax.Array] = None) -> jax.Array:
        d = self.width
        params = {
            "qkv": {"kernel": self.param("qkv_kernel", self.kernel_init,
                                         (d, 3 * d), jnp.float32),
                    "bias": self.param("qkv_bias", nn.initializers.zeros,
                                       (3 * d,), jnp.float32)},
            "out": {"kernel": self.param("out_kernel", self.kernel_init,
                                         (d, d), jnp.float32),
                    "bias": self.param("out_bias", nn.initializers.zeros,
                                       (d,), jnp.float32)},
        }
        kv = q_in if kv_in is None else kv_in
        return multi_head_attention(params, q_in, kv, num_heads=self.heads,
                                    bias=bias, impl=self.impl,
                                    compute_dtype=self.compute_dtype)


class Mlp(nn.Module):
    """fc1 → act → fc2. CLIP blocks use QuickGELU; timm-style modules use
    exact (erf) GELU — pick via `act`."""
    hidden: int
    out: int
    act: str = "quick_gelu"   # or "gelu"
    compute_dtype: jnp.dtype = jnp.bfloat16
    kernel_init: Callable = trunc_normal_02

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, kernel_init=self.kernel_init,
                     dtype=self.compute_dtype, param_dtype=jnp.float32,
                     name="c_fc")(x)
        if self.act == "quick_gelu":
            x = quick_gelu(x)
        else:
            x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, kernel_init=self.kernel_init,
                        dtype=self.compute_dtype, param_dtype=jnp.float32,
                        name="c_proj")(x)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block: x += attn(ln_1(x)); x += mlp(ln_2(x)).

    Shared by the CLIP text tower (module_clip_ttransformer.py:20-52) and the
    SegViT patch/group stages (module_seg_vit.py:162-196).
    """
    width: int
    heads: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    attention_impl: str = "xla"

    def setup(self):
        self.ln_1 = LayerNormFP32()
        self.attn = MHAttention(self.width, self.heads,
                                compute_dtype=self.compute_dtype,
                                impl=self.attention_impl)
        self.ln_2 = LayerNormFP32()
        self.mlp = Mlp(4 * self.width, self.width, act="quick_gelu",
                       compute_dtype=self.compute_dtype)

    def __call__(self, x: jax.Array,
                 bias: Optional[jax.Array] = None) -> jax.Array:
        x = x + self.attn(self.ln_1(x), bias=bias)
        x = x + self.mlp(self.ln_2(x))
        return x


class GroupedLinear(nn.Module):
    """Block-diagonal linear over the channel axis — the TPU-native form of
    the reference's grouped 1x1 Conv1d (module_seg_vit.py:266-269): `groups`
    independent (d/g, d/g) mixes, computed as one batched einsum."""
    width: int
    groups: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.groups
        dg = self.width // g
        kernel = self.param("kernel", trunc_normal_02, (g, dg, dg),
                            jnp.float32)
        b, l, _ = x.shape
        xg = x.reshape(b, l, g, dg).astype(self.compute_dtype)
        y = jnp.einsum("blgi,gio->blgo", xg, kernel.astype(self.compute_dtype),
                       preferred_element_type=jnp.float32)
        return y.astype(self.compute_dtype).reshape(b, l, self.width)
