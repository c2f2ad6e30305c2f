"""Pretraining CLI (main_task_align.py equivalent).

    python -m segclip_tpu.cli.train --datatype cc,coco, --data-dir /data \
        --batch-size 768 --epochs 10 --lr 4e-3 --lower-lr 4e-6 \
        --use-seglabel --use-vision-mae-recon --init-model ViT-B-16.pt

Smoke run (no data needed):
    python -m segclip_tpu.cli.train --datatype synthetic --batch-size 8 \
        --epochs 1 --opts model.vision_width=64 ...
"""
from __future__ import annotations

import argparse
import dataclasses
import os

from segclip_tpu.config import (Config, DataConfig, OptimConfig,
                                TrainConfig, apply_overrides)
from segclip_tpu.utils.logging import get_logger

# Documented one-command recipes (--preset). Values become parser
# DEFAULTS, so any flag the user passes explicitly still wins; the
# preset's `opts` are PREPENDED to --opts, so user overrides win there
# too (apply_overrides is last-wins).
PRESETS = {
    # The from-scratch grounding recipe distilled from the 8-run
    # schedule/data study (docs/PERF.md "Learning the shapes corpus"):
    # flat lr 4e-4 head AND backbone, 10% warmup, gumbel_tau 3.0 +
    # group_balance 1.0 (the from-scratch anti-collapse aids), B=96
    # both-caption corpus with the cosine ending ≤~5k steps (4 epochs at
    # 60k scenes), per-epoch eval with keep_best. Reproduces run 8's
    # 17.0 mIoU (12.0 at init) from a fresh `prepare_data shapes` corpus:
    #   python -m segclip_tpu.cli.prepare_data shapes \
    #       --out-dir /data/shapes --train-n 60000 --eval-n 300
    #   python -m segclip_tpu.cli.train --preset shapes-learnability \
    #       --data-dir /data/shapes --output-dir /root/run
    # (--eval-data-root defaults to <data-dir>/eval under this preset.)
    "shapes-learnability": dict(
        datatype="shapes", batch_size=96, epochs=4, lr=4e-4,
        lower_lr=4e-4, warmup_proportion=0.1, use_seglabel=True,
        use_vision_mae_recon=True, eval_each_epoch=True,
        opts=["eval.dataset=shapes", "model.gumbel_tau=3.0",
              "model.group_balance_weight=1.0", "train.keep_best=true"]),
}


def build_config(args) -> Config:
    from segclip_tpu.config import model_config_for
    model = model_config_for(
        args.clip_arch,
        use_seglabel=args.use_seglabel,
        use_vision_mae_recon=args.use_vision_mae_recon,
        use_text_mae_recon=args.use_text_mae_recon,
        max_words=args.max_words,
        **({} if args.first_stage_layer is None
           else {"first_stage_layer": args.first_stage_layer}))
    optim = OptimConfig(
        lr=args.lr, lower_lr=args.lower_lr,
        warmup_proportion=args.warmup_proportion,
        weight_decay=args.weight_decay,
        freeze_layer_num=args.freeze_layer_num,
        freeze_text_layer_num=args.freeze_text_layer_num)
    data = DataConfig(datatype=args.datatype, batch_size=args.batch_size,
                      max_words=args.max_words, data_dir=args.data_dir,
                      num_workers=args.num_workers)
    train_c = TrainConfig(epochs=args.epochs, seed=args.seed,
                          grad_accum_steps=args.grad_accum_steps,
                          log_every=args.n_display,
                          output_dir=args.output_dir,
                          resume=args.resume_model,
                          eval_each_epoch=args.eval_each_epoch)
    cfg = Config(model=model, optim=optim, data=data, train=train_c)
    return apply_overrides(cfg, args.opts)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--datatype", default="synthetic",
                    help='comma-joined dataset names, e.g. "cc,coco," '
                         'or "synthetic"')
    ap.add_argument("--data-dir", default="")
    ap.add_argument("--batch-size", type=int, default=768,
                    help="GLOBAL batch size")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=4e-3)
    ap.add_argument("--lower-lr", type=float, default=4e-6)
    ap.add_argument("--warmup-proportion", type=float, default=0.15)
    ap.add_argument("--weight-decay", type=float, default=0.05)
    ap.add_argument("--max-words", type=int, default=32)
    ap.add_argument("--clip-arch", default="ViT-B/16",
                    choices=["ViT-B/16", "ViT-B/32", "ViT-L/14"],
                    help="CLIP backbone preset (the reference's "
                         "pretrained_clip_name, modeling.py:38-41); "
                         "ViT-L/14 splits 22/2")
    ap.add_argument("--first-stage-layer", type=int, default=None,
                    help="override the preset's two-stage split point")
    ap.add_argument("--freeze-layer-num", type=int, default=0)
    ap.add_argument("--freeze-text-layer-num", type=int, default=0)
    ap.add_argument("--use-seglabel", action="store_true")
    ap.add_argument("--use-vision-mae-recon", action="store_true")
    ap.add_argument("--use-text-mae-recon", action="store_true")
    ap.add_argument("--init-model", default=None,
                    help="torch CLIP/.bin checkpoint or Orbax params")
    ap.add_argument("--resume-model", default=None)
    ap.add_argument("--do-resume", action="store_true")
    ap.add_argument("--num-workers", type=int, default=0,
                    help="decode worker processes (-1 = cpu_count - 1)")
    ap.add_argument("--n-display", type=int, default=50)
    ap.add_argument("--grad-accum-steps", type=int, default=1)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the first epoch")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--output-dir", default="output/pretrain")
    ap.add_argument("--eval-each-epoch", action="store_true")
    ap.add_argument("--eval-data-root", default=None,
                    help="VOC root for per-epoch zero-shot eval")
    ap.add_argument("--dist-coordinator", default=None, metavar="HOST:PORT",
                    help="multi-host coordinator address "
                         "(torch.distributed.launch equivalent); also "
                         "settable via SEGCLIP_DIST_* env")
    ap.add_argument("--dist-num-processes", type=int, default=None)
    ap.add_argument("--dist-process-id", type=int, default=None)
    ap.add_argument("--opts", nargs="*", default=[],
                    help="config overrides, e.g. model.vision_width=256")
    ap.add_argument("--preset", default=None, choices=sorted(PRESETS),
                    help="named recipe applied as parser defaults "
                         "(explicit flags and --opts still win); "
                         "'shapes-learnability' is the documented "
                         "from-scratch grounding recipe (docs/PERF.md)")

    # two-pass parse: the preset sets DEFAULTS, so explicit flags override
    pre, _ = ap.parse_known_args(argv)
    preset_opts: list = []
    if pre.preset:
        preset = dict(PRESETS[pre.preset])
        preset_opts = list(preset.pop("opts", []))
        ap.set_defaults(**preset)
    args = ap.parse_args(argv)
    args.opts = preset_opts + args.opts
    if (args.preset and args.eval_data_root is None and args.data_dir
            and args.eval_each_epoch):
        args.eval_data_root = os.path.join(args.data_dir, "eval")

    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax(coordinator=args.dist_coordinator,
              num_processes=args.dist_num_processes,
              process_id=args.dist_process_id)

    cfg = build_config(args)
    import jax
    logger = get_logger(cfg.train.output_dir
                        if jax.process_index() == 0 else None)
    logger.info("config: %s", dataclasses.asdict(cfg))

    eval_fn = None
    if args.eval_each_epoch and args.eval_data_root:
        from segclip_tpu.cli.eval_zeroshot import build_segmenter
        from segclip_tpu.evalseg.datasets import (DATASET_SPECS,
                                                  SegEvalDataset)
        from segclip_tpu.evalseg.inference import evaluate_dataset

        def eval_fn(model, params):
            import contextlib
            import jax
            spec = DATASET_SPECS[cfg.eval.dataset]
            mcfg = cfg.model
            prec_ctx = contextlib.nullcontext()
            if cfg.eval.compute_dtype:
                # dtype-clone of the training model (params shared): the
                # reference evals at fp32 regardless of the train precision
                # (amp O0 default, main_seg_zeroshot.py:179). float32 also
                # scopes 'highest' matmul precision over the eval graphs —
                # f32 storage alone still lowers dots to bf16 multiplies on
                # TPU (docs/PERF.md); the scope ends before any training
                # graph can retrace.
                from segclip_tpu.models.segclip import SegCLIP
                mcfg = dataclasses.replace(
                    mcfg, compute_dtype=cfg.eval.compute_dtype)
                model = SegCLIP(mcfg)
                if cfg.eval.compute_dtype == "float32":
                    prec_ctx = jax.default_matmul_precision("highest")
            ds = SegEvalDataset(spec, args.eval_data_root)
            # loop.py calls eval_fn on host 0 only, so the sharded path is
            # single-process here: batch over host 0's local devices
            # (and/or several images per device, eval.images_per_device).
            # build_segmenter runs INSIDE the precision scope so the text
            # bank's class-embedding dots get the deterministic 6-pass
            # lowering too (docs/PERF.md "Deterministic eval mode").
            with prec_ctx:
                seg = build_segmenter(model, params, mcfg, spec,
                                      template_set=cfg.eval.template_set)
                if jax.process_count() == 1 and (
                        jax.local_device_count() > 1
                        or cfg.eval.images_per_device > 1):
                    from segclip_tpu.evalseg.inference import \
                        evaluate_dataset_sharded
                    return evaluate_dataset_sharded(
                        seg, ds, logger=logger,
                        images_per_device=cfg.eval.images_per_device)["mIoU"]
                return evaluate_dataset(seg, ds, logger=logger)["mIoU"]

    from segclip_tpu.train.loop import train
    from segclip_tpu.utils.profiling import trace_if
    with trace_if(args.profile, enabled=args.profile is not None):
        result = train(cfg, init_model=args.init_model,
                       resume=args.do_resume or bool(args.resume_model),
                       eval_fn=eval_fn)
    logger.info("training done: %d epochs, final loss %f",
                result["epochs_run"], result["final_loss"])


if __name__ == "__main__":
    main()
