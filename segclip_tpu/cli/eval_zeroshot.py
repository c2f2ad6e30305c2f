"""Zero-shot segmentation mIoU evaluation (main_seg_zeroshot.py equivalent).

    python -m segclip_tpu.cli.eval_zeroshot --dataset voc \
        --data-root /data/VOC2012 --init-model segclip.bin
"""
from __future__ import annotations

import argparse
import json

from segclip_tpu.config import ModelConfig, apply_overrides
from segclip_tpu.cli.common import load_model
from segclip_tpu.evalseg.datasets import DATASET_SPECS, SegEvalDataset
from segclip_tpu.evalseg.inference import ZeroShotSegmenter, evaluate_dataset
from segclip_tpu.evalseg.text_bank import build_text_bank
from segclip_tpu.utils.logging import get_logger


def build_segmenter(model, params, cfg: ModelConfig, spec,
                    template_set: str = "simple",
                    bg_thresh: float | None = None) -> ZeroShotSegmenter:
    classnames = spec.classes[1:] if spec.with_bg else spec.classes
    bank = build_text_bank(model, params, classnames, template_set,
                           context_length=cfg.context_length)
    return ZeroShotSegmenter(
        model, params, bank, with_bg=spec.with_bg,
        bg_thresh=spec.bg_thresh if bg_thresh is None else bg_thresh,
        patch_size=cfg.vision_patch_size)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", choices=sorted(DATASET_SPECS), default="voc")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--init-model", default=None,
                    help="torch .bin/.pt or Orbax params dir")
    ap.add_argument("--template", default="simple",
                    choices=["simple", "subset", "full", "identity"])
    ap.add_argument("--bg-thresh", type=float, default=None,
                    help="override the per-dataset background threshold")
    ap.add_argument("--limit", type=int, default=None,
                    help="evaluate only the first N images")
    ap.add_argument("--sharded", choices=["auto", "on", "off"],
                    default="auto",
                    help="batch images across the device mesh (auto: when "
                         ">1 device/process is available)")
    ap.add_argument("--images-per-device", type=int, default=1,
                    help=">1 batches several same-shape-bucket images per "
                         "device (+51%% img/s measured at 4 on one v5e; "
                         "6.3%% of pixels argmax-flip under the bf16 "
                         "vmapped-dot tiling, mIoU +-0.3 — invariant under "
                         "--compute-dtype float32; docs/PERF.md)")
    ap.add_argument("--compute-dtype", default=None,
                    choices=["bfloat16", "float32"],
                    help="encode dtype; default keeps the model config's "
                         "(bfloat16). float32 is the reference's eval "
                         "precision (amp O0, seg_segmentation/default.yml:2) "
                         "and — together with the matmul precision below — "
                         "makes predictions invariant to "
                         "--images-per-device batching (docs/PERF.md)")
    ap.add_argument("--matmul-precision", default=None,
                    choices=["default", "highest"],
                    help="TPU dot precision for the eval graphs. The TPU "
                         "lowers float32 dots to bf16 multiplies unless "
                         "'highest' (6-pass) is requested — float32 storage "
                         "alone still argmax-flips 8%% of pixels under "
                         "batching; float32+highest flips <1e-6 "
                         "(docs/PERF.md). Defaults to 'highest' when "
                         "--compute-dtype float32, else 'default'")
    ap.add_argument("--dist-coordinator", default=None, metavar="HOST:PORT")
    ap.add_argument("--dist-num-processes", type=int, default=None)
    ap.add_argument("--dist-process-id", type=int, default=None)
    ap.add_argument("--output-dir", default="output/eval")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="model config overrides key=value")
    args = ap.parse_args(argv)

    if args.sharded == "off" and args.images_per_device > 1:
        raise SystemExit(
            "--images-per-device > 1 requires the sharded eval path; "
            "drop --sharded off (or use --images-per-device 1)")

    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax(coordinator=args.dist_coordinator,
              num_processes=args.dist_num_processes,
              process_id=args.dist_process_id)

    import jax
    logger = get_logger(args.output_dir if jax.process_index() == 0
                        else None)
    cfg = ModelConfig()
    for item in args.opts:
        cfg = apply_overrides(cfg, [item])
    if args.compute_dtype:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, compute_dtype=args.compute_dtype)

    model, params, cfg = load_model(args.init_model, cfg)
    spec = DATASET_SPECS[args.dataset]
    # config snapshot (reference main_seg_zeroshot.py:318-321), host 0 only
    import dataclasses, os
    if jax.process_index() == 0:
        with open(os.path.join(args.output_dir, "config.json"), "w") as f:
            json.dump({"model": dataclasses.asdict(cfg),
                       "dataset": args.dataset, "template": args.template,
                       "bg_thresh": args.bg_thresh,
                       "images_per_device": args.images_per_device,
                       "sharded": args.sharded}, f, indent=2)
    logger.info("dataset=%s classes=%d bg_thresh=%.2f", spec.name,
                len(spec.classes),
                spec.bg_thresh if args.bg_thresh is None else args.bg_thresh)

    dataset = SegEvalDataset(spec, args.data_root, limit=args.limit)
    logger.info("evaluating %d images", len(dataset))

    use_sharded = (args.sharded == "on" or args.images_per_device > 1
                   or (args.sharded == "auto"
                       and (jax.local_device_count() > 1
                            or jax.process_count() > 1)))
    # Precision keys off the RESOLVED compute dtype (after --opts merging),
    # so `--opts model.compute_dtype=float32` gets the same deterministic
    # 6-pass dots as --compute-dtype float32. The text-bank encode in
    # build_segmenter runs INSIDE the scope — class-embedding dots at
    # default precision would silently stay bf16 multiplies even at f32
    # storage (docs/PERF.md "Deterministic eval mode").
    precision = args.matmul_precision or (
        "highest" if cfg.compute_dtype == "float32" else "default")
    import contextlib
    prec_ctx = (jax.default_matmul_precision("highest")
                if precision == "highest" else contextlib.nullcontext())
    with prec_ctx:
        segmenter = build_segmenter(model, params, cfg, spec,
                                    template_set=args.template,
                                    bg_thresh=args.bg_thresh)
        if use_sharded:
            from segclip_tpu.evalseg.inference import evaluate_dataset_sharded
            results = evaluate_dataset_sharded(
                segmenter, dataset, logger=logger,
                images_per_device=args.images_per_device)
        else:
            results = evaluate_dataset(segmenter, dataset, logger=logger)
    logger.info("mIoU=%.2f mAcc=%.2f aAcc=%.2f", results["mIoU"],
                results["mAcc"], results["aAcc"])
    # per-class IoU table (the reference's mmseg dataset.evaluate prints
    # one, main_seg_zeroshot.py:156-161); absent classes log as None
    per_class = results.get("per_class", {})
    for name, iou in per_class.items():
        logger.info("  IoU %-16s %s", name,
                    "n/a" if iou is None else f"{iou:.2f}")
    print(json.dumps({"dataset": spec.name, "mIoU": results["mIoU"],
                      "mAcc": results["mAcc"], "aAcc": results["aAcc"],
                      "per_class": {k: (None if v is None else round(v, 2))
                                    for k, v in per_class.items()}}))
    return results


if __name__ == "__main__":
    main()
