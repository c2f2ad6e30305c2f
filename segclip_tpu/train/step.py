"""The pjit/shard_map training step.

Semantics per reference train_epoch (main_task_align.py:292-359):
  forward (4 losses) → backward → global-norm grad clip at 1.0 →
  NaN-loss step skip (grads computed, optimizer untouched) →
  AdaptAdamW update (schedule fused) → post-step clamp of logit_scale
  to ln(100).

Distribution: batch sharded over the `data` mesh axis, params replicated.
Gradients are `psum`-averaged (the DDP all-reduce equivalent); the InfoNCE
all-gather and rank-offset labels ride the same axis name.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from segclip_tpu.config import Config
from segclip_tpu.models.segclip import SegCLIP
from segclip_tpu.parallel.mesh import DATA_AXIS
from segclip_tpu.train.optimizer import (AdaptAdamWState, adapt_adamw,
                                         global_norm_clip)
from segclip_tpu.train.param_groups import lr_wd_trees, trainable_tree


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: AdaptAdamWState
    rng: jax.Array


def create_train_state(cfg: Config, params: Any, t_total: int,
                       seed: int = 0) -> Tuple[TrainState, Any, Any]:
    """Build (TrainState, optimizer transform, trainable-mask tree). The
    mask feeds the step's _loss_fn, which stop_gradients frozen leaves so
    they contribute no gradient anywhere — including the global clip norm,
    which the reference's requires_grad=False params never reach."""
    lr_tree, wd_tree = lr_wd_trees(params, cfg.optim)
    trainable = trainable_tree(params, cfg.optim,
                               first_stage_layer=cfg.model.first_stage_layer)
    tx = adapt_adamw(lr_tree, wd_tree, trainable, t_total=t_total,
                     warmup=cfg.optim.warmup_proportion,
                     schedule=cfg.optim.schedule, b1=cfg.optim.b1,
                     b2=cfg.optim.b2, eps=cfg.optim.eps,
                     lr_start=cfg.optim.lr_start, lr_end=cfg.optim.lr_end,
                     moment_dtype=cfg.optim.moment_dtype)
    # jit the optimizer init: eager zeros_like would dispatch one remote
    # compile per distinct tensor shape on tunneled backends.
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state,
                       rng=jax.random.key(seed))
    return state, tx, trainable


def _normalize_images(batch: dict, model: Optional[SegCLIP] = None) -> dict:
    """uint8 batches (shipped by the data pipeline to quarter IPC and
    host→device transfer) are CLIP-normalized on device; float batches are
    assumed pre-normalized. Device-augmentation batches (image_window
    present — data/pipeline.py device_aug mode) additionally run the
    bicubic crop-resize on the MXU first (ops/device_aug.py). jit
    specializes on the batch pytree so these are static branches."""
    from segclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    if "image_y" in batch:
        # YUV420 transport (data/pipeline.py transfer='yuv420'):
        # reconstruct RGB on device, then CLIP-normalize.
        from segclip_tpu.ops.device_aug import yuv420_to_rgb
        batch = dict(batch)
        img = yuv420_to_rgb(batch.pop("image_y"),
                            batch.pop("image_cbcr")) / 255.0
        batch["image"] = (img - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
        return batch
    if "image_window" in batch:
        from segclip_tpu.ops.device_aug import crop_resize_batch
        batch = dict(batch)
        img = crop_resize_batch(batch["image"], batch.pop("image_window"),
                                batch.pop("image_transposed"),
                                model.cfg.image_resolution) / 255.0
        batch["image"] = (img - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
        return batch
    if batch["image"].dtype != jnp.uint8:
        return batch
    batch = dict(batch)
    img = batch["image"].astype(jnp.float32) / 255.0
    batch["image"] = (img - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    return batch


def _loss_fn(params, model: SegCLIP, batch, rngs, axis_name,
             trainable=None):
    if trainable is not None:
        # requires_grad=False equivalent AT THE AD LEVEL: cutting the
        # cotangent edge here means XLA never emits the frozen weights'
        # backward ops (conv1 dW + the patchify backward chain, the
        # token-embedding scatter-add, pos-embed reductions) instead of
        # computing them and zeroing afterwards.
        params = jax.tree.map(
            lambda p, t: p if t else jax.lax.stop_gradient(p),
            params, trainable)
    losses = model.apply({"params": params}, batch["input_ids"],
                         batch["attention_mask"], batch["image"],
                         batch.get("image_seg"), training=True,
                         axis_name=axis_name,
                         text_class=batch.get("text_class"),
                         scene_classes=batch.get("scene_classes"), rngs=rngs)
    return losses["loss"], losses


def train_step_fn(state: TrainState, batch: dict, model: SegCLIP, tx,
                  max_grad_norm: float = 1.0,
                  axis_name: Optional[str] = DATA_AXIS,
                  grad_accum_steps: int = 1,
                  trainable: Optional[Any] = None):
    """One optimizer step. Runs replicated under shard_map (or single-device
    when axis_name is None). With grad_accum_steps > 1 the per-shard batch is
    split into micro-batches scanned sequentially, gradients averaged before
    the update (reference main_task_align.py:315-341 semantics)."""
    batch = _normalize_images(batch, model)
    step_rng = jax.random.fold_in(state.rng, state.step)
    if axis_name is not None:
        # decorrelate Gumbel/MAE noise across shards
        step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(axis_name))

    grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)

    if grad_accum_steps == 1:
        g_rng, m_rng = jax.random.split(step_rng)
        rngs = {"gumbel": g_rng, "mae": m_rng}
        (loss, losses), grads = grad_fn(state.params, model, batch, rngs,
                                        axis_name, trainable)
    else:
        def split_micro(x):
            b = x.shape[0]
            assert b % grad_accum_steps == 0, (b, grad_accum_steps)
            return x.reshape((grad_accum_steps, b // grad_accum_steps)
                             + x.shape[1:])

        micro_batches = jax.tree.map(split_micro, batch)
        zero_grads = jax.tree.map(jnp.zeros_like, state.params)

        def body(carry, inp):
            acc_grads, idx = carry
            mb = inp
            r = jax.random.fold_in(step_rng, idx)
            g_rng, m_rng = jax.random.split(r)
            (_, losses_i), grads_i = grad_fn(
                state.params, model, mb, {"gumbel": g_rng, "mae": m_rng},
                axis_name, trainable)
            acc_grads = jax.tree.map(jnp.add, acc_grads, grads_i)
            return (acc_grads, idx + 1), losses_i

        (grads, _), losses_all = jax.lax.scan(
            body, (zero_grads, jnp.int32(0)), micro_batches)
        grads = jax.tree.map(lambda g: g / grad_accum_steps, grads)
        losses = jax.tree.map(lambda x: jnp.mean(x, axis=0), losses_all)
        loss = losses["loss"]

    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        losses = jax.lax.pmean(losses, axis_name)
        loss = losses["loss"]

    # Frozen params have exactly-zero grads (the stop_gradient in _loss_fn —
    # requires_grad=False equivalent), so the clip norm matches the
    # reference, which never sees them.
    grads, grad_norm = global_norm_clip(grads, max_grad_norm)

    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

    # Post-step clamp: logit_scale ≤ ln(100) (main_task_align.py:344-347).
    clamped = jnp.minimum(new_params["clip"]["logit_scale"],
                          jnp.log(100.0).astype(
                              new_params["clip"]["logit_scale"].dtype))
    new_params = dict(new_params)
    new_params["clip"] = dict(new_params["clip"])
    new_params["clip"]["logit_scale"] = clamped

    # NaN-loss skip: keep old params & optimizer state, don't advance the
    # schedule (main_task_align.py:331-338 / torch step-not-called).
    ok = jnp.logical_not(jnp.isnan(loss))

    def pick(new, old):
        return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, old)

    final_params = pick(new_params, state.params)
    final_opt = pick(new_opt_state, state.opt_state)

    new_state = state.replace(step=state.step + 1, params=final_params,
                              opt_state=final_opt)
    metrics = dict(losses)
    metrics["grad_norm"] = grad_norm
    metrics["skipped_nan"] = jnp.logical_not(ok).astype(jnp.float32)
    return new_state, metrics


def make_sharded_train_step(mesh: Mesh, model: SegCLIP, tx,
                            max_grad_norm: float = 1.0,
                            grad_accum_steps: int = 1,
                            trainable: Optional[Any] = None,
                            packed_spec=None):
    """jit(shard_map(train_step)): batch sharded on `data`, state replicated.

    With `packed_spec` (parallel.mesh.PackedSpec) the step takes the single
    packed (B, row_bytes) uint8 buffer the prefetch thread ships (one
    host→device transfer instead of 4-6 — the tunneled link pays ~50 ms
    per array) and unpacks it on device."""
    fn = functools.partial(train_step_fn, model=model, tx=tx,
                           max_grad_norm=max_grad_norm, axis_name=DATA_AXIS,
                           grad_accum_steps=grad_accum_steps,
                           trainable=trainable)
    if packed_spec is not None:
        inner = fn

        def fn(state, buf):
            return inner(state, packed_spec.unpack(buf))
    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False)
    # Donate the state: params + both Adam moments (~1.8 GB fp32 at ViT-B)
    # update in place instead of double-buffering.
    return jax.jit(sharded, donate_argnums=(0,))


def make_single_device_train_step(model: SegCLIP, tx,
                                  max_grad_norm: float = 1.0,
                                  grad_accum_steps: int = 1,
                                  trainable: Optional[Any] = None):
    fn = functools.partial(train_step_fn, model=model, tx=tx,
                           max_grad_norm=max_grad_norm, axis_name=None,
                           grad_accum_steps=grad_accum_steps,
                           trainable=trainable)
    return jax.jit(fn)
