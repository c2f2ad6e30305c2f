"""Elementwise / normalization primitives.

Numerics contract (matching reference module_clip_util.py:126-136):
  - LayerNorm always computes in float32 and casts back to the input dtype,
    even when activations are bf16. Parameters are stored fp32.
  - QuickGELU is x * sigmoid(1.702 x).
XLA fuses these into neighboring matmuls; no Pallas needed for them alone.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """fp32 LayerNorm over the last axis, cast back to x.dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's QuickGELU: x * sigmoid(1.702 * x)."""
    return x * jax.nn.sigmoid(1.702 * x)
