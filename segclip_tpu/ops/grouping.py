"""Semantic grouping numerics: Gumbel straight-through assignment and
count-normalized aggregation of patch features into group tokens.

Reproduces the math of the reference SemanticLearnerModule core
(module_seg_vit.py:221-242 gumbel_softmax; 304-310 assign + aggregate):
  logits (B, G, L) from q·k, softmax over the *group* axis (dim=1),
  straight-through hard one-hot, aggregation out = (hard @ v) / count.

The fused Pallas kernel (ops/pallas/grouping.py) computes
logits→gumbel→hard→aggregate in one VMEM pass (training included, via a
custom straight-through VJP); this module holds the reference jnp path
(which XLA also fuses well at these shapes) and the shared Gumbel
sampling. Both paths produce identical values and gradients
(tests/test_pallas.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def gumbel_softmax(
    logits: jax.Array,
    tau: float = 1.0,
    hard: bool = False,
    axis: int = -1,
    key: Optional[jax.Array] = None,
    training: bool = True,
    gumbel_noise: Optional[jax.Array] = None,
) -> jax.Array:
    """Gumbel-softmax with optional straight-through hard one-hot.

    training=True adds Gumbel(0,1) noise and divides by tau before softmax;
    training=False is a plain softmax (reference module_seg_vit.py:230-231).
    `gumbel_noise` overrides sampling for deterministic tests.
    """
    logits32 = logits.astype(jnp.float32)
    if training:
        if gumbel_noise is None:
            if key is None:
                raise ValueError("gumbel_softmax(training=True) needs a key")
            gumbel_noise = jax.random.gumbel(key, logits.shape, jnp.float32)
        y_soft = jax.nn.softmax((logits32 + gumbel_noise) / tau, axis=axis)
    else:
        y_soft = jax.nn.softmax(logits32, axis=axis)

    if hard:
        index = jnp.argmax(y_soft, axis=axis)
        y_hard = jax.nn.one_hot(index, logits.shape[axis], axis=axis,
                                dtype=jnp.float32)
        # Straight-through: forward = hard, gradient = soft.
        y = y_hard - jax.lax.stop_gradient(y_soft) + y_soft
    else:
        y = y_soft
    return y.astype(logits.dtype)


def group_assign_aggregate(
    logits: jax.Array,
    v: jax.Array,
    tau: float,
    key: Optional[jax.Array] = None,
    training: bool = True,
    gumbel_noise: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Hard-assign each patch to a group and average its values per group.

    logits: (B, G, L) group-affinity logits (un-scaled q·k).
    v:      (B, L, D) patch values.
    Returns (grouped (B,G,D), hard_attn (B,G,L), soft_attn (B,G,L)).

    softmax is over the G axis (each patch distributes over groups); the
    aggregation divides by the (clamped) per-group patch count
    (module_seg_vit.py:305-310).
    """
    hard_attn = gumbel_softmax(logits, tau=tau, hard=True, axis=1, key=key,
                               training=training, gumbel_noise=gumbel_noise)
    soft_attn = jax.nn.softmax(logits.astype(jnp.float32), axis=1).astype(logits.dtype)

    grouped = jnp.einsum("bgl,bld->bgd", hard_attn, v,
                         preferred_element_type=jnp.float32)
    counts = jnp.sum(hard_attn.astype(jnp.float32), axis=-1, keepdims=True)
    grouped = grouped / jnp.maximum(counts, 1.0)
    return grouped.astype(v.dtype), hard_attn, soft_attn
