"""Differentiable collectives for the global-batch contrastive loss.

The reference needed diffdist's autograd all_gather over NCCL
(util_module.py:180-190) so gradients flow back through the gather; in JAX
`lax.all_gather` is natively differentiable and rides ICI/DCN under a mesh.
All helpers degrade to identity when no mesh axis is in scope, so the same
loss code runs single-device (tests) and sharded (training).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def axis_in_scope(axis_name: Optional[str]) -> bool:
    if axis_name is None:
        return False
    try:
        jax.lax.axis_index(axis_name)
        return True
    except NameError:
        return False


def global_gather(x: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """Concatenate x across the named mesh axis (differentiable).

    Equivalent of reference dist_collect (util_module.py:180-190): returns
    (world·B, ...) with gradients flowing to every shard.
    """
    if not axis_in_scope(axis_name):
        return x
    gathered = jax.lax.all_gather(x, axis_name)   # (world, B, ...)
    return gathered.reshape((-1,) + x.shape[1:])


def rank_of(axis_name: Optional[str]) -> jax.Array:
    if not axis_in_scope(axis_name):
        return jnp.zeros((), jnp.int32)
    return jax.lax.axis_index(axis_name)
