"""Single-image zero-shot segmentation demo (main_seg_vis.py equivalent).

    python -m segclip_tpu.cli.demo --input examples/voc.jpg \
        --init-model segclip.bin --vis input_pred_label --dataset voc
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from segclip_tpu.config import ModelConfig, apply_overrides
from segclip_tpu.cli.common import load_model
from segclip_tpu.cli.eval_zeroshot import build_segmenter
from segclip_tpu.evalseg.datasets import (DATASET_SPECS, keep_ratio_resize,
                                          normalize_pixels)
from segclip_tpu.evalseg.visualize import save_visualization
from segclip_tpu.utils.logging import get_logger

VIS_MODES = ("input", "pred", "input_pred", "input_pred_label",
             "all_groups", "first_group", "final_group")


def main(argv=None):
    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="input image path")
    ap.add_argument("--init-model", default=None)
    ap.add_argument("--dataset", choices=sorted(DATASET_SPECS), default="voc",
                    help="class vocabulary to segment against")
    ap.add_argument("--vis", nargs="+", default=["input_pred"],
                    choices=VIS_MODES)
    ap.add_argument("--mode", choices=["slide", "whole"], default="slide",
                    help="raw images use slide (main_seg_vis.py:145-148)")
    ap.add_argument("--output-dir", default="output/vis_imgs")
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args(argv)

    logger = get_logger(args.output_dir)
    cfg = ModelConfig()
    for item in args.opts:
        cfg = apply_overrides(cfg, [item])

    model, params, cfg = load_model(args.init_model, cfg)
    spec = DATASET_SPECS[args.dataset]
    segmenter = build_segmenter(model, params, cfg, spec)

    img = Image.open(args.input).convert("RGB")
    resized = keep_ratio_resize(img)
    norm = normalize_pixels(np.asarray(resized))
    show = np.asarray(resized)

    pred = segmenter.predict(norm, orig_shape=(show.shape[0], show.shape[1]),
                             mode=args.mode)
    groups = [segmenter.group_map(norm)]

    stem = os.path.splitext(os.path.basename(args.input))[0]
    for mode in args.vis:
        out_file = os.path.join(args.output_dir, mode, f"{stem}.jpg")
        save_visualization(mode, out_file, show, pred, spec.palette,
                           spec.classes, spec.with_bg, group_maps=groups)
        logger.info("wrote %s", out_file)
    labels = sorted(int(l) for l in np.unique(pred))
    logger.info("predicted classes: %s",
                [spec.classes[l] for l in labels])


if __name__ == "__main__":
    main()
