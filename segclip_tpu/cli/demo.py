"""Zero-shot segmentation demo (main_seg_vis.py equivalent).

Single image:
    python -m segclip_tpu.cli.demo --input examples/voc.jpg \
        --init-model segclip.bin --vis input_pred_label --dataset voc

Dataset mode (the reference's dataset-keyword input, main_seg_vis.py:145-148
— first N val images, whole-image inference):
    python -m segclip_tpu.cli.demo --dataset voc --data-root /data/VOC2012 \
        --first-n 10 --vis input_pred_label
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from segclip_tpu.config import ModelConfig, apply_overrides
from segclip_tpu.cli.common import load_model
from segclip_tpu.cli.eval_zeroshot import build_segmenter
from segclip_tpu.evalseg.datasets import (DATASET_SPECS, SegEvalDataset,
                                          keep_ratio_resize,
                                          normalize_pixels)
from segclip_tpu.evalseg.visualize import save_visualization
from segclip_tpu.utils.logging import get_logger

VIS_MODES = ("input", "pred", "input_pred", "input_pred_label",
             "all_groups", "first_group", "final_group")


def _run_one(segmenter, spec, norm, show, stem, vis_modes, mode, output_dir,
             logger):
    pred = segmenter.predict(norm, orig_shape=(show.shape[0], show.shape[1]),
                             mode=mode)
    groups = [segmenter.group_map(norm)]
    for vis in vis_modes:
        out_file = os.path.join(output_dir, vis, f"{stem}.jpg")
        written = save_visualization(vis, out_file, show, pred, spec.palette,
                                     spec.classes, spec.with_bg,
                                     group_maps=groups)
        for path in written:
            logger.info("wrote %s", path)
    labels = sorted(int(l) for l in np.unique(pred))
    logger.info("%s predicted classes: %s", stem,
                [spec.classes[l] for l in labels])


def main(argv=None):
    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", default=None, help="input image path")
    ap.add_argument("--data-root", default=None,
                    help="dataset root — visualize the first N val images "
                         "instead of --input")
    ap.add_argument("--first-n", type=int, default=10,
                    help="images to visualize in dataset mode")
    ap.add_argument("--init-model", default=None)
    ap.add_argument("--dataset", choices=sorted(DATASET_SPECS), default="voc",
                    help="class vocabulary to segment against")
    ap.add_argument("--vis", nargs="+", default=["input_pred"],
                    choices=VIS_MODES)
    ap.add_argument("--mode", choices=["slide", "whole"], default=None,
                    help="default: slide for --input, whole for dataset "
                         "mode (main_seg_vis.py:145-148)")
    ap.add_argument("--output-dir", default="output/vis_imgs")
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args(argv)
    if (args.input is None) == (args.data_root is None):
        ap.error("give exactly one of --input or --data-root")

    logger = get_logger(args.output_dir)
    cfg = ModelConfig()
    for item in args.opts:
        cfg = apply_overrides(cfg, [item])

    model, params, cfg = load_model(args.init_model, cfg)
    spec = DATASET_SPECS[args.dataset]
    segmenter = build_segmenter(model, params, cfg, spec)

    if args.input:
        img = Image.open(args.input).convert("RGB")
        resized = keep_ratio_resize(img)
        norm = normalize_pixels(np.asarray(resized))
        show = np.asarray(resized)
        stem = os.path.splitext(os.path.basename(args.input))[0]
        _run_one(segmenter, spec, norm, show, stem, args.vis,
                 args.mode or "slide", args.output_dir, logger)
        return

    # dataset mode: first N val images, whole-image inference at the
    # RESIZED resolution (the reference visualizes the network input)
    dataset = SegEvalDataset(spec, args.data_root, limit=args.first_n)
    from segclip_tpu.evalseg.datasets import PIXEL_MEAN, PIXEL_STD
    for sample in dataset:
        # un-normalize for display
        show = np.clip(sample.image * PIXEL_STD + PIXEL_MEAN, 0,
                       255).astype(np.uint8)
        _run_one(segmenter, spec, sample.image, show, sample.name, args.vis,
                 args.mode or "whole", args.output_dir, logger)


if __name__ == "__main__":
    main()
