"""GSPMD sharding: data×tensor-parallel training without touching model code.

The shard_map step (train/step.py) is the explicit-SPMD data-parallel path
matching the reference's DDP. This module adds the compiler-partitioned
alternative: the train step is written as a GLOBAL-batch program (axis_name
None — the contrastive loss sees the full batch directly) and jitted with
sharding annotations; XLA inserts all collectives. That unlocks tensor
parallelism (Megatron-style MLP/attention sharding over a `model` axis) by
annotating parameter shardings only — useful beyond ViT-B scale, and it
validates on a CPU mesh because the program is semantically identical to
the single-device one.

Sharding rules (classic Megatron):
  attn qkv_kernel (d, 3d)   → shard output dim   P(None, "model")
  attn out_kernel (d, d)    → shard input dim    P("model", None)
  mlp  c_fc kernel (d, 4d)  → shard output dim   P(None, "model")
  mlp  c_proj kernel (4d,d) → shard input dim    P("model", None)
  token_embedding (V, d)    → shard vocab        P("model", None)
  everything else           → replicated
Biases of sharded-output layers follow their kernel; a dimension that does
not divide the axis size stays replicated.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_dp_tp_mesh(n_data: int, n_model: int,
                    devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _spec_for(path: str, leaf, axis_size: int) -> P:
    def divisible(dim):
        return leaf.ndim > dim and leaf.shape[dim] % axis_size == 0

    if path.endswith("attn/qkv_kernel") or path.endswith("mlp/c_fc/kernel"):
        # the packed qkv output dim splits into 3 equal blocks; shard only
        # when each block divides the axis
        ok = divisible(1)
        if path.endswith("qkv_kernel"):
            ok = ok and (leaf.shape[1] // 3) % axis_size == 0
        if ok:
            return P(None, MODEL_AXIS)
    if path.endswith("attn/qkv_bias") or path.endswith("mlp/c_fc/bias"):
        if leaf.shape[0] % axis_size == 0 and \
           (not path.endswith("qkv_bias")
                or (leaf.shape[0] // 3) % axis_size == 0):
            return P(MODEL_AXIS)
    if path.endswith("attn/out_kernel") or path.endswith("mlp/c_proj/kernel"):
        if divisible(0):
            return P(MODEL_AXIS, None)
    if path.endswith("token_embedding/embedding"):
        if divisible(0):
            return P(MODEL_AXIS, None)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for the parameter pytree under the dp×tp mesh."""
    axis_size = mesh.shape[MODEL_AXIS]

    def rec(node, prefix):
        if isinstance(node, dict):
            return {k: rec(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in node.items()}
        return NamedSharding(mesh, _spec_for(prefix, node, axis_size))

    return rec(params, "")


def state_shardings(state, mesh: Mesh):
    """TrainState shardings: params + both Adam moments sharded alike,
    scalars replicated."""
    p_sh = param_shardings(state.params, mesh)
    rep = NamedSharding(mesh, P())
    return state.replace(
        step=rep, params=p_sh, rng=rep,
        opt_state=state.opt_state._replace(step=rep, mu=p_sh, nu=p_sh))


_FETCH_JIT: dict = {}        # mesh → jitted replicating identity


def fetch_replicated(tree: Any, mesh: Mesh) -> Any:
    """Host-local numpy copies of a (possibly TP-sharded) global tree.

    A jit identity with replicated out_shardings makes XLA all-gather any
    sharded leaves; each host then reads its first addressable shard, which
    for a replicated array IS the full value. Under multi-host meshes this
    is a collective program — EVERY process must call it (gate any
    host-0-only consumer after, not before).

    The jitted identity is cached per mesh (a fresh lambda would retrace on
    every per-epoch call). Note the gather transiently materializes a full
    replica on every device — fine at ViT scale; gather leaf-by-leaf if a
    future model's replicated params no longer fit."""
    fn = _FETCH_JIT.get(mesh)
    if fn is None:
        rep = NamedSharding(mesh, P())
        fn = jax.jit(lambda t: t, out_shardings=rep)
        _FETCH_JIT[mesh] = fn
    gathered = fn(tree)
    return jax.tree.map(lambda x: np.asarray(x.addressable_shards[0].data),
                        gathered)


def make_gspmd_train_step(mesh: Mesh, model, tx, state,
                          max_grad_norm: float = 1.0,
                          grad_accum_steps: int = 1,
                          trainable=None):
    """Compiler-partitioned train step over a ("data", "model") mesh.

    The step function is the global-batch program (axis_name=None); batch
    leading dim sharded over `data`, params per the TP rules. Returns
    (step_fn, place_state, place_batch).
    """
    from segclip_tpu.train.step import train_step_fn

    st_sh = state_shardings(state, mesh)
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    fn = functools.partial(train_step_fn, model=model, tx=tx,
                           max_grad_norm=max_grad_norm, axis_name=None,
                           grad_accum_steps=grad_accum_steps,
                           trainable=trainable)

    # metrics replicated
    step = jax.jit(fn, in_shardings=(st_sh, batch_sharding),
                   donate_argnums=(0,))

    # Placement via a jitted identity, not device_put: device_put rejects
    # global shardings whose devices span other processes, while a jit over
    # the global mesh accepts host-local (replicated-identical) numpy
    # inputs on every process.
    _place = jax.jit(lambda s: s, out_shardings=st_sh)

    def place_state(s):
        return _place(s)

    def place_batch(b):
        if jax.process_count() == 1:
            return jax.tree.map(
                lambda x: jax.device_put(x, batch_sharding), b)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                batch_sharding, x), b)

    return step, place_state, place_batch
