"""AdaptAdamW: AdamW with the LR schedule fused into the step and
pre-update decoupled weight decay.

Reproduces modules/optimization_adamw.py exactly, as one jit-friendly
optax-style GradientTransformation:
  - per-group peak LR / weight decay via a label pytree (8 groups from
    main_task_align.py:175-249, see param_groups.py);
  - schedule evaluated *inside* the update from the shared step counter
    (`warmup_cosine` | `warmup_constant` | `warmup_linear`, with
    lr_start/lr_end as fractions of peak — optimization_adamw.py:26-50);
  - decay applied to the parameter BEFORE the Adam update:
    p ← p·(1 − lr_t·wd) − (lr_t/bc1)·m / (√(v/bc2) + eps)
    (optimization_adamw.py:168, intentionally different from stock AdamW);
  - frozen leaves (requires_grad=False equivalent) are completely untouched:
    no moments, no decay, no update.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def warmup_cosine(x, warmup, lr_start=0.0, lr_end=0.0):
    warm = x * (1.0 - lr_start) / warmup + lr_start
    new_x = (x - warmup) / (1.0 - warmup)
    cos = lr_end + 0.5 * (1.0 - lr_end) * (1.0 + jnp.cos(jnp.pi * new_x))
    return jnp.where(x < warmup, warm, cos)


def warmup_constant(x, warmup, lr_start=0.0, lr_end=0.0):
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_linear(x, warmup, lr_start=0.0, lr_end=0.0):
    return jnp.where(x < warmup, x / warmup,
                     jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0))


SCHEDULES: Dict[str, Callable] = {
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
    "warmup_linear": warmup_linear,
}


class AdaptAdamWState(NamedTuple):
    step: jax.Array          # shared scalar step (all live params step together)
    mu: Any                  # first moments
    nu: Any                  # second moments


def adapt_adamw(
    lr_tree: Any,
    wd_tree: Any,
    trainable_tree: Any,
    t_total: int,
    warmup: float = 0.15,
    schedule: str = "warmup_cosine",
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-6,
    lr_start: float = 0.0,
    lr_end: float = 0.0,
    moment_dtype: str = "float32",
) -> optax.GradientTransformation:
    """lr_tree/wd_tree/trainable_tree: pytrees of scalars matching params
    (per-leaf peak LR, weight decay, and trainability).

    moment_dtype: storage dtype for the Adam moments. "bfloat16" halves the
    optimizer's HBM footprint and read/write traffic (2×N params × 4B →
    2B); the update math always runs in fp32, only the carried m/v are
    rounded. fp32 (the reference's torch semantics) is the default."""
    schedule_fct = SCHEDULES[schedule]
    mdt = jnp.dtype(moment_dtype)

    def init_fn(params):
        def zeros(p):
            return jnp.zeros(p.shape, mdt)
        return AdaptAdamWState(step=jnp.zeros((), jnp.int32),
                               mu=jax.tree.map(zeros, params),
                               nu=jax.tree.map(zeros, params))

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("adapt_adamw requires params")
        step = state.step + 1
        stepf = step.astype(jnp.float32)
        bc1 = 1.0 - b1 ** stepf
        bc2 = 1.0 - b2 ** stepf
        if t_total > 0:
            progress = stepf / t_total
            sched = schedule_fct(progress, warmup, lr_start, lr_end)
        else:
            sched = jnp.float32(1.0)

        def upd(g, m, v, p, lr, wd, trainable):
            g32 = g.astype(jnp.float32)
            m = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g32)
            lr_t = lr * sched
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            delta = -p.astype(jnp.float32) * lr_t * wd - (lr_t / bc1) * m / denom
            if not trainable:
                z = jnp.zeros(m.shape, mdt)
                return jnp.zeros_like(p), z, z
            return delta.astype(p.dtype), m.astype(mdt), v.astype(mdt)

        out = jax.tree.map(upd, grads, state.mu, state.nu, params, lr_tree,
                           wd_tree, trainable_tree)
        updates = jax.tree.map(lambda t: t[0], out,
                               is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree.map(lambda t: t[1], out,
                          is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree.map(lambda t: t[2], out,
                          is_leaf=lambda t: isinstance(t, tuple))
        return updates, AdaptAdamWState(step=step, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def scheduled_lr(step: jax.Array, peak_lr: float, t_total: int,
                 warmup: float, schedule: str = "warmup_cosine",
                 lr_start: float = 0.0, lr_end: float = 0.0) -> jax.Array:
    """get_lr() introspection equivalent (optimization_adamw.py:92-109)."""
    if t_total <= 0:
        return jnp.float32(peak_lr)
    progress = step.astype(jnp.float32) / t_total
    return peak_lr * SCHEDULES[schedule](progress, warmup, lr_start, lr_end)


def global_norm_clip(grads: Any, max_norm: float):
    """clip_grad_norm_(max_norm) equivalent: scale all grads by
    max_norm/(total_norm+1e-6) when total_norm > max_norm."""
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), gnorm
