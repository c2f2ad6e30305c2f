"""Measured mIoU ceilings for the shapes eval protocol (VERDICT r3 #3).

Any SegCLIP-style model predicts at PATCH granularity: the hard patch->group
assignment lives on the 16x16-pixel grid of each 224x224 slide window
(reference vit_seg.py:202-256 upsamples that map bilinearly, our
evalseg/inference.py mirrors it).  So the eval number of ANY run is bounded
by two oracles this script measures directly on the eval split, CPU-only:

  patch_oracle   -- per 16x16 block of the keep-ratio-resized image, predict
                    the block's majority GT class; one-hot, bilinear-resize
                    to the original GT shape, argmax (the same decode path
                    the real segmenter uses).  This is the ceiling of a
                    PERFECTLY grounded model under the protocol.
  single_winner  -- same oracle, but every shape class except one fixed
                    winner is predicted as background.  This is the ceiling
                    of the single-winner regime the from-scratch runs
                    occupy (docs/PERF.md "Run E"); reported per choice of
                    winner class.

Usage:
  PYTHONPATH=/root/repo python scripts/ceiling_study.py \
      --eval-root /root/shapes60k_holdout/eval [--out ceiling.json]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
from PIL import Image

from segclip_tpu.evalseg.datasets import SHAPES_CLASSES, keep_ratio_resize
from segclip_tpu.evalseg.miou import MIoUMeter

PATCH = 16


def _majority_per_block(label: np.ndarray, n_cls: int) -> np.ndarray:
    """(H, W) int labels -> (H//16, W//16) majority label per 16x16 block.

    H, W are multiples of 16 only when the resized size is; pad with the
    edge value so partial border blocks still vote (matching how the slide
    grid covers the border via overlapping windows).
    """
    h, w = label.shape
    ph = (PATCH - h % PATCH) % PATCH
    pw = (PATCH - w % PATCH) % PATCH
    lab = np.pad(label, ((0, ph), (0, pw)), mode="edge")
    hb, wb = lab.shape[0] // PATCH, lab.shape[1] // PATCH
    blocks = lab.reshape(hb, PATCH, wb, PATCH).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(hb, wb, PATCH * PATCH)
    counts = np.apply_along_axis(np.bincount, 2, blocks, minlength=n_cls)
    return counts.argmax(axis=2).astype(np.int32)


def _decode_like_eval(block_labels: np.ndarray, n_cls: int,
                      out_hw: tuple) -> np.ndarray:
    """One-hot block labels -> PIL bilinear logits upsample -> argmax, the
    same decode shape as evalseg/inference.py:200-212 (device bilinear)."""
    oh, ow = out_hw
    logits = np.zeros((n_cls, oh, ow), np.float32)
    for c in range(n_cls):
        plane = (block_labels == c).astype(np.float32)
        im = Image.fromarray(plane)
        logits[c] = np.asarray(im.resize((ow, oh), Image.BILINEAR))
    return logits.argmax(axis=0).astype(np.int32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-root", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    names = [l.strip() for l in open(os.path.join(
        args.eval_root, "ImageSets/Segmentation/val.txt")) if l.strip()]
    n_cls = len(SHAPES_CLASSES)
    shape_ids = list(range(1, n_cls))

    patch_meter = MIoUMeter(n_cls)
    winner_meters = {c: MIoUMeter(n_cls) for c in shape_ids}

    for i, name in enumerate(names):
        gt = np.asarray(Image.open(os.path.join(
            args.eval_root, "SegmentationClass", f"{name}.png")), np.int32)
        # mirror the image geometry: keep-ratio resize (nearest for labels)
        gt_img = Image.fromarray(gt.astype(np.uint8))
        rs = keep_ratio_resize(gt_img.convert("RGB"))
        gt_resized = np.asarray(gt_img.resize(rs.size, Image.NEAREST),
                                np.int32)
        blocks = _majority_per_block(gt_resized, n_cls)
        pred = _decode_like_eval(blocks, n_cls, gt.shape)
        patch_meter.update(pred, gt)
        for c in shape_ids:
            win = np.where((pred == c) | (pred == 0), pred, 0)
            winner_meters[c].update(win, gt)
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(names)}  patch-oracle running mIoU "
                  f"{patch_meter.results()['mIoU']:.2f}")

    out = {
        "n_images": len(names),
        "patch_oracle": patch_meter.results(SHAPES_CLASSES),
        "single_winner": {
            SHAPES_CLASSES[c]: {
                "mIoU": winner_meters[c].results()["mIoU"],
                "winner_IoU": winner_meters[c].results(
                    SHAPES_CLASSES)["per_class"][SHAPES_CLASSES[c]],
                "background_IoU": winner_meters[c].results(
                    SHAPES_CLASSES)["per_class"]["background"],
            } for c in shape_ids
        },
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
