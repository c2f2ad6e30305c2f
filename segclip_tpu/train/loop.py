"""The training driver: epochs over the sharded step with logging,
checkpointing, NaN accounting, and per-epoch zero-shot eval.

Cadence mirrors main_task_align.py:292-359 + 455-495: per-`log_every` step
LR/loss/time logging, per-epoch checkpoint, optional in-training VOC mIoU.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import numpy as np

from segclip_tpu.config import Config
from segclip_tpu.checkpoint.orbax_io import (auto_resume_path,
                                             restore_checkpoint,
                                             save_checkpoint)
from segclip_tpu.data.pipeline import (BatchLoader, ShardedEpochSampler,
                                       build_dataset)
from segclip_tpu.models.segclip import init_segclip
from segclip_tpu.parallel.mesh import (make_mesh, prefetch_to_device,
                                       shard_batch)
from segclip_tpu.train.optimizer import scheduled_lr
from segclip_tpu.train.step import (create_train_state,
                                    make_sharded_train_step)
from segclip_tpu.utils.logging import MetricWriter, get_logger


def train(cfg: Config, init_model: Optional[str] = None,
          resume: bool = False, eval_fn=None) -> dict:
    """Returns {'epochs_run', 'final_loss', 'checkpoints'}.

    eval_fn(model, params) → mIoU float, called per epoch when
    cfg.train.eval_each_epoch (injected to avoid a circular import with
    evalseg; cli/train.py wires the VOC evaluator in).
    """
    # log.txt is host-0-only (each host still logs to its own stderr) — a
    # shared output_dir must not get interleaved lines from every host
    logger = get_logger(cfg.train.output_dir
                        if jax.process_index() == 0 else None)
    metrics_writer = MetricWriter(cfg.train.output_dir)

    # Pipeline ships uint8 images; the train step normalizes on device.
    emit_class_ids = cfg.model.infonce_mask != "none"
    dataset = build_dataset(cfg.data, use_seg=cfg.model.use_seglabel,
                            normalize=False,
                            vocab_size=cfg.model.vocab_size,
                            image_size=cfg.model.image_resolution,
                            patch_size=cfg.model.vision_patch_size,
                            emit_class_ids=emit_class_ids)
    n_hosts = jax.process_count()
    host = jax.process_index()
    sampler = ShardedEpochSampler(len(dataset), cfg.data.batch_size,
                                  shard=host, num_shards=n_hosts,
                                  seed=cfg.train.seed)
    num_workers = cfg.data.num_workers
    if num_workers < 0:
        num_workers = max(1, (os.cpu_count() or 1) - 1)
    loader = BatchLoader(
        dataset, sampler, seed=cfg.train.seed, prefetch=cfg.data.prefetch,
        num_workers=num_workers,
        dataset_factory=functools.partial(
            build_dataset, cfg.data, use_seg=cfg.model.use_seglabel,
            normalize=False, vocab_size=cfg.model.vocab_size,
            image_size=cfg.model.image_resolution,
            patch_size=cfg.model.vision_patch_size,
            emit_class_ids=emit_class_ids))
    steps_per_epoch = sampler.steps
    if steps_per_epoch == 0:
        raise ValueError(
            f"dataset of {len(dataset)} samples yields zero steps at global "
            f"batch {cfg.data.batch_size} — reduce the batch size")
    t_total = steps_per_epoch * cfg.train.epochs
    logger.info("dataset=%s len=%d steps/epoch=%d t_total=%d",
                cfg.data.datatype, len(dataset), steps_per_epoch, t_total)

    if init_model:
        from segclip_tpu.cli.common import load_model
        model, params, _ = load_model(init_model, cfg.model)
    else:
        model, params = init_segclip(cfg.model, seed=cfg.train.seed)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info("model parameters: %.1fM", n_params / 1e6)

    state, tx, trainable = create_train_state(cfg, params, t_total=t_total,
                                              seed=cfg.train.seed)
    del params

    # Packed single-buffer transfer (parallel.mesh.PackedSpec): bit-exact,
    # and the tunneled/tunnel-like links pay per-array overhead the 4-6
    # field arrays would multiply. Spec comes from one probed sample.
    pack_spec = None
    if cfg.data.packed_transfer and cfg.train.tensor_parallelism == 1:
        from segclip_tpu.data.pipeline import _load_one
        from segclip_tpu.parallel.mesh import PackedSpec
        probe = _load_one(dataset, 0, np.random.default_rng(0))
        pack_spec = PackedSpec.from_batch(
            {k: np.asarray(v)[None] for k, v in probe.items()})

    tp = cfg.train.tensor_parallelism
    if tp > 1 and (tp > jax.device_count() or jax.device_count() % tp):
        raise ValueError(
            f"train.tensor_parallelism={tp} must divide the device count "
            f"({jax.device_count()})")
    if tp > 1:
        # Compiler-partitioned dp×tp (Megatron sharding rules, XLA-inserted
        # collectives) — the beyond-reference scaling path for widths where
        # replicated params stop fitting.
        from segclip_tpu.parallel.gspmd import (make_dp_tp_mesh,
                                                make_gspmd_train_step,
                                                state_shardings)
        n_data = cfg.train.data_parallelism
        if n_data == -1:
            n_data = jax.device_count() // tp
        mesh = make_dp_tp_mesh(n_data, tp)
        step_fn, place_state, _ = make_gspmd_train_step(
            mesh, model, tx, state,
            max_grad_norm=cfg.optim.max_grad_norm,
            grad_accum_steps=cfg.train.grad_accum_steps,
            trainable=trainable)
        restore_sharding = state_shardings(state, mesh)
        logger.info("mesh: dp%d × tp%d (GSPMD)", n_data, tp)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = make_mesh(cfg.train.data_parallelism)
        place_state = None
        step_fn = make_sharded_train_step(
            mesh, model, tx, max_grad_norm=cfg.optim.max_grad_norm,
            grad_accum_steps=cfg.train.grad_accum_steps, trainable=trainable,
            packed_spec=pack_spec)
        restore_sharding = NamedSharding(mesh, P())

    start_epoch = 0
    resumed = False
    if resume:
        path = cfg.train.resume or auto_resume_path(cfg.train.output_dir)
        if path:
            state, last_epoch = restore_checkpoint(
                path, state, sharding=restore_sharding)
            start_epoch = last_epoch + 1
            resumed = True
            logger.info("resumed from %s → epoch %d", path, start_epoch)
    if place_state is not None and not resumed:
        state = place_state(state)     # restore already placed on the mesh

    end_epoch = cfg.train.epochs
    if cfg.train.epochs_per_run > 0:
        end_epoch = min(end_epoch, start_epoch + cfg.train.epochs_per_run)

    # Establish cross-process communicators NOW, while every host is still
    # at the same point — the first collective pays a rendezvous with a
    # hard 30 s deadline (gloo), and the first train step would otherwise
    # be it, behind per-host decode-worker spawn / first-batch decode skew
    # (parallel/mesh.warmup_collectives; docs/PERF.md "Multi-host
    # timeouts").
    from segclip_tpu.parallel.mesh import warmup_collectives
    warmup_collectives(mesh)

    ckpts = []
    try:
        result = _run_epochs(
            cfg, range(start_epoch, end_epoch), loader, step_fn,
            state, model, mesh, steps_per_epoch, t_total, n_hosts, host,
            eval_fn, logger, metrics_writer, ckpts,
            eval_fetch=(n_hosts > 1 or tp > 1), pack_spec=pack_spec)
    finally:
        # always tear the decode worker pool down — a step failure or
        # KeyboardInterrupt must not leak spawned processes when train()
        # is used as a library function.
        loader.close()
    return {"epochs_run": end_epoch - start_epoch,
            "final_loss": result["final_loss"], "checkpoints": ckpts,
            "state": result["state"], "model": model}


def _read_best(output_dir: str) -> dict:
    """{'miou': float, 'epoch': int} from <output_dir>/best.json, or the
    sentinel — persists keep_best's running maximum across epochs_per_run
    resume segments."""
    import json
    path = os.path.join(output_dir, "best.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"miou": -1.0, "epoch": -1}


def _run_epochs(cfg, epochs, loader, step_fn, state, model, mesh,
                steps_per_epoch, t_total, n_hosts, host, eval_fn, logger,
                metrics_writer, ckpts, eval_fetch: bool = False,
                pack_spec=None) -> dict:
    final_loss = float("nan")
    keep_best = cfg.train.keep_best
    if keep_best and not (eval_fn is not None and cfg.train.eval_each_epoch):
        logger.warning("train.keep_best needs eval_each_epoch + an eval "
                       "dataset — ignoring it")
        keep_best = False
    best = -1.0
    if keep_best:
        # host 0 owns best.json; the value is broadcast so every host takes
        # the identical save-or-not branch below (Orbax save is collective)
        best = float(_read_best(cfg.train.output_dir)["miou"]) \
            if host == 0 else -1.0
        if n_hosts > 1:
            from jax.experimental import multihost_utils
            best = float(multihost_utils.broadcast_one_to_all(
                np.asarray(best, np.float32)))
    # Track the global step host-side: fetching int(state.step) per step
    # would force a device sync every iteration, serializing dispatch on
    # tunneled backends. One sync here covers resume offsets.
    gstep = int(state.step)
    for epoch in epochs:
        t_start = time.time()
        window_start = time.time()
        n_steps = 0

        for batch in prefetch_to_device(loader.epoch(epoch), mesh,
                                        depth=cfg.data.device_prefetch,
                                        pack_spec=pack_spec):
            state, metrics = step_fn(state, batch)
            gstep += 1
            # host 0 logs/writes (reference gates on local_rank 0,
            # main_task_align.py:350-356) — other hosts never sync here,
            # and a shared output_dir gets no duplicate/interleaved lines.
            if host == 0 and gstep % cfg.train.log_every == 0:
                loss = float(metrics["loss"])          # host fetch = sync
                lr = float(scheduled_lr(
                    state.opt_state.step, cfg.optim.lr, t_total,
                    cfg.optim.warmup_proportion, cfg.optim.schedule,
                    cfg.optim.lr_start, cfg.optim.lr_end))
                dt = (time.time() - window_start) / cfg.train.log_every
                window_start = time.time()
                logger.info(
                    "Epoch %d/%d Step %d/%d Lr %.9f Loss %f Time/step %.3f",
                    epoch + 1, cfg.train.epochs, n_steps + 1,
                    steps_per_epoch, lr, loss, dt)
                metrics_writer.write(gstep, epoch=epoch, lr=lr,
                                     **{k: float(v)
                                        for k, v in metrics.items()})
            n_steps += 1

        # epoch summary (sync once)
        final_loss = float(metrics["loss"])
        logger.info("Epoch %d done in %.1fs, last loss %f",
                    epoch + 1, time.time() - t_start, final_loss)

        # Orbax save is a multi-process collective — every host must call it
        # (gating on host 0 deadlocks multi-host runs at the save barrier).
        # Cadence: every checkpoint_every epochs plus always the last
        # epoch of this run — both the schedule's end AND a segment end
        # under epochs_per_run, so a resume always has a checkpoint
        # (default 1 = the reference's per-epoch save,
        # main_task_align.py:258-274; the gate is config-derived so all
        # hosts take the same branch).
        if ((epoch + 1) % cfg.train.checkpoint_every == 0
                or epoch == epochs[-1]):
            path = save_checkpoint(cfg.train.output_dir, epoch, state)
            if host == 0:
                ckpts.append(path)
                logger.info("checkpoint saved to %s", path)

        # Per-epoch zero-shot eval: host 0 runs the (local-device) segmenter
        # and the scalar is broadcast to every host — the reference's rank-0
        # multi_gpu_test + broadcast_object_list (main_seg_zeroshot.py:160).
        # Non-zero hosts block at the broadcast barrier meanwhile.
        if eval_fn is not None and cfg.train.eval_each_epoch:
            eval_params = state.params
            if eval_fetch:
                # Multi-host params are not usable from a single-process
                # jit, and TP-sharded params are committed to the training
                # mesh (which may cover fewer devices than eval's).
                # fetch_replicated all-gathers sharded leaves and hands
                # every host a host-local numpy copy — a COLLECTIVE under
                # multi-host, so it runs on all hosts, before the host-0
                # gate.
                from segclip_tpu.parallel.gspmd import fetch_replicated
                eval_params = fetch_replicated(state.params, mesh)
            miou = float("nan")
            if host == 0:
                try:
                    if eval_fetch:
                        # commit the fetched numpy tree to local devices
                        # once — the segmenter jits otherwise re-upload the
                        # full params on EVERY predict call
                        eval_params = jax.device_put(eval_params)
                    miou = float(eval_fn(model, eval_params))
                except Exception as e:       # eval must not kill training
                    logger.warning("per-epoch eval failed: %s", e)
            if n_hosts > 1:
                from jax.experimental import multihost_utils
                miou = float(multihost_utils.broadcast_one_to_all(
                    np.asarray(miou, np.float32)))
            if not np.isnan(miou):
                logger.info("Epoch %d zero-shot mIoU: %.2f", epoch + 1, miou)
                if host == 0:
                    metrics_writer.write(gstep, epoch=epoch, miou=miou)
                if keep_best and miou > best:
                    best = miou
                    path = save_checkpoint(cfg.train.output_dir, epoch,
                                           state, name="ckpt_best")
                    if host == 0:
                        import json
                        with open(os.path.join(cfg.train.output_dir,
                                               "best.json"), "w") as f:
                            json.dump({"miou": best, "epoch": epoch}, f)
                        logger.info("new best mIoU %.2f → %s", best, path)

    return {"final_loss": final_loss, "state": state}
