"""Pixel-level margin probe: WHO beats a minority class at its own pixels?

Run R located the single-winner regime in the spatial pathway (pooled
AUCs rise for every class while the spatial eval stays winner-take-all —
docs/PERF.md "Run R"). This probe resolves the last ambiguity at the
pixel level. The decode (evalseg/inference._decode_crops, reference
vit_seg.py:202-256 semantics) assigns each pixel its group's class
affinity and a background indicator `max_fg_aff < bg_thresh`, so a
minority class can lose its own pixels two distinct ways:

  (confusion)  the winner class out-scores it among the foreground
               channels — the group embedding actually matches the
               wrong class; or
  (threshold)  its own class IS the foreground argmax, but the
               affinity sits below bg_thresh and the pixel falls to
               background — grounded but not confident.

Per GT class, over the standard eval split, this script reports the
foreground argmax identity at that class's own pixels, where the final
prediction went (bg / own / winner-class), and the mean affinities —
machine-written JSON like every other study in docs/artifacts/.

Usage (chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/spatial_margin_probe.py \
        --ckpt /root/runR/ckpt_best --data-root /root/shapes48k_monly_h6/eval \
        [--out docs/artifacts/runR_marginprobe.json]
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data-root", required=True,
                    help="standard eval dir (VOC layout, shapes spec)")
    ap.add_argument("--template", default="simple")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()

    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import cv2

    from segclip_tpu.cli.common import load_model
    from segclip_tpu.cli.eval_zeroshot import build_segmenter
    from segclip_tpu.config import ModelConfig, apply_overrides
    from segclip_tpu.evalseg.datasets import DATASET_SPECS, SegEvalDataset

    cfg = ModelConfig(use_vision_mae_recon=True, use_seglabel=True,
                      gumbel_tau=3.0, group_balance_weight=1.0)
    cfg = apply_overrides(cfg, args.opts)
    model, params, cfg = load_model(args.ckpt, cfg)
    spec = DATASET_SPECS["shapes"]
    dataset = SegEvalDataset(spec, args.data_root, limit=args.limit)
    seg = build_segmenter(model, params, cfg, spec,
                          template_set=args.template)
    classes = list(spec.classes)           # ['background', 6 shapes]
    n_cls = len(classes)
    print(f"{len(dataset)} images, bg_thresh={seg.bg_thresh}")

    # per GT class: counts of (fg-argmax == own), final-pred identity
    # histogram, and affinity sums for own vs the fg winner channel.
    fg_own = np.zeros(n_cls, np.int64)
    npix = np.zeros(n_cls, np.int64)
    pred_hist = np.zeros((n_cls, n_cls), np.int64)
    own_aff_sum = np.zeros(n_cls, np.float64)
    best_other_sum = np.zeros(n_cls, np.float64)

    for i, s in enumerate(dataset):
        logits = seg.slide(s.image)                     # (C, h, w)
        oh, ow = s.orig_shape
        up = cv2.resize(logits.transpose(1, 2, 0), (ow, oh),
                        interpolation=cv2.INTER_LINEAR)  # (oh, ow, C)
        pred = up.argmax(axis=-1)
        fg = up[..., 1:]                                # shapes channels
        fg_arg = fg.argmax(axis=-1) + 1
        fg_sorted = np.sort(fg, axis=-1)
        label = s.label
        for c in range(1, n_cls):
            m = label == c
            k = int(m.sum())
            if not k:
                continue
            npix[c] += k
            fg_own[c] += int((fg_arg[m] == c).sum())
            pred_hist[c] += np.bincount(pred[m], minlength=n_cls)
            own = fg[..., c - 1][m]
            own_aff_sum[c] += float(own.sum())
            # best among the OTHER fg channels: top-1 unless own is it
            top1, top2 = fg_sorted[..., -1][m], fg_sorted[..., -2][m]
            best_other_sum[c] += float(
                np.where(np.isclose(own, top1), top2, top1).sum())
        if (i + 1) % 50 == 0:
            print(f"  {i + 1}/{len(dataset)}")

    report = {"ckpt": args.ckpt, "bg_thresh": seg.bg_thresh,
              "per_class": {}}
    for c in range(1, n_cls):
        if not npix[c]:
            continue
        n = float(npix[c])
        report["per_class"][classes[c]] = {
            "gt_pixels": int(npix[c]),
            "fg_argmax_is_own": round(fg_own[c] / n, 4),
            "pred_background": round(pred_hist[c, 0] / n, 4),
            "pred_own": round(pred_hist[c, c] / n, 4),
            "pred_other_fg": round(
                (n - pred_hist[c, 0] - pred_hist[c, c]) / n, 4),
            "mean_own_aff": round(own_aff_sum[c] / n, 4),
            "mean_best_other_fg_aff": round(best_other_sum[c] / n, 4),
        }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
