"""Orbax checkpointing of the full train state.

Replaces the reference's per-epoch torch.save pair
(`pytorch_model.bin.{epoch}` + `pytorch_opt.bin.{epoch}`,
main_task_align.py:258-290) with per-step/epoch Orbax directories holding
{params, opt_state, step, epoch}, plus max-kept GC and auto-resume
(the GroupViT-inherited helpers in seg_segmentation/checkpoint.py:97-138).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(output_dir: str, epoch: int, state: Any,
                    max_kept: int = -1, name: Optional[str] = None) -> str:
    """Save TrainState under <output_dir>/<name or ckpt_epoch_<epoch>>.

    `name` overrides the directory name (e.g. "ckpt_best" for
    train.keep_best — kept outside the ckpt_epoch_* namespace so
    auto-resume and GC never touch it); the payload's epoch field still
    records which epoch produced it."""
    path = os.path.join(_abs(output_dir), name or f"ckpt_epoch_{epoch}")
    ckptr = ocp.StandardCheckpointer()
    # epoch is a host scalar — keep it numpy: a host-local jax.Array can't
    # be serialized from a multi-host process (orbax rejects it), while
    # numpy leaves are written by the primary host.
    payload = {"params": state.params, "opt_state_mu": state.opt_state.mu,
               "opt_state_nu": state.opt_state.nu,
               "opt_step": state.opt_state.step,
               "step": state.step,
               "epoch": np.asarray(epoch, np.int32)}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if max_kept > 0:
        _gc_old(output_dir, max_kept)
    return path


def _list_ckpts(output_dir: str):
    root = _abs(output_dir)
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        if d.startswith("ckpt_epoch_"):
            try:
                out.append((int(d.rsplit("_", 1)[1]), os.path.join(root, d)))
            except ValueError:
                continue
    return sorted(out)


def _gc_old(output_dir: str, max_kept: int) -> None:
    import shutil
    ckpts = _list_ckpts(output_dir)
    for _, path in ckpts[:-max_kept]:
        shutil.rmtree(path, ignore_errors=True)


def auto_resume_path(output_dir: str) -> Optional[str]:
    """Latest checkpoint dir, or None (auto_resume_helper equivalent)."""
    ckpts = _list_ckpts(output_dir)
    return ckpts[-1][1] if ckpts else None


def restore_checkpoint(path: str, state: Any,
                       sharding: Any = None) -> tuple[Any, int]:
    """Restore into a template TrainState; returns (state, epoch).

    `sharding` restores arrays directly onto the mesh — required under a
    multi-device mesh (a plain restore commits to device 0 and then clashes
    with mesh-sharded step inputs) and the multi-host-correct path (each
    host reads only its addressable shards). Either ONE Sharding applied to
    every leaf (the replicated dp case) or a TrainState-shaped pytree of
    per-leaf shardings (the GSPMD dp×tp case, parallel/gspmd.py
    state_shardings)."""
    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "opt_state_mu": state.opt_state.mu,
                "opt_state_nu": state.opt_state.nu,
                "opt_step": state.opt_state.step,
                "step": state.step,
                "epoch": np.asarray(0, np.int32)}
    if sharding is not None:
        if isinstance(sharding, jax.sharding.Sharding):
            sh_tree = {k: jax.tree.map(lambda _: sharding, v)
                       for k, v in template.items() if k != "epoch"}
        else:                       # TrainState-shaped pytree of shardings
            sh_tree = {"params": sharding.params,
                       "opt_state_mu": sharding.opt_state.mu,
                       "opt_state_nu": sharding.opt_state.nu,
                       "opt_step": sharding.opt_state.step,
                       "step": sharding.step}
        # epoch is (and restores as) a concrete numpy leaf — only the jax
        # array entries get sharded restore templates
        template = {
            k: (v if k == "epoch" else jax.tree.map(
                lambda x, s: jax.ShapeDtypeStruct(
                    jax.numpy.shape(x), x.dtype, sharding=s),
                v, sh_tree[k]))
            for k, v in template.items()}
    restored = ckptr.restore(_abs(path), template)
    new_state = state.replace(
        step=restored["step"], params=restored["params"],
        opt_state=state.opt_state._replace(mu=restored["opt_state_mu"],
                                           nu=restored["opt_state_nu"],
                                           step=restored["opt_step"]))
    return new_state, int(restored["epoch"])


def save_params(output_dir: str, name: str, params: Any) -> str:
    """Model-weights-only save (the --init_model role)."""
    path = os.path.join(_abs(output_dir), name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params}, force=True)
    ckptr.wait_until_finished()
    return path


def restore_params(path: str, params_template: Any) -> Any:
    """Restore model weights from either a save_params directory OR a full
    training checkpoint (save_checkpoint's {params, opt_state_*, ...}) —
    evaluating a mid-training ckpt_epoch_N directly is the reference's
    `--init_model pytorch_model.bin.N` workflow (main_task_align.py:160)."""
    ckptr = ocp.StandardCheckpointer()
    template = {"params": params_template}
    try:
        return ckptr.restore(_abs(path), template)["params"]
    except BaseException:
        with ocp.PyTreeCheckpointer() as ptc:
            restored = ptc.restore(
                _abs(path),
                args=ocp.args.PyTreeRestore(item=template,
                                            partial_restore=True))
        return restored["params"]
