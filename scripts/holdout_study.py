"""Open-vocabulary compositional-generalization study (VERDICT r3 ask #1).

The reference's titular claim is OPEN-vocabulary segmentation: class names
are chosen at EVAL time, not baked into training (reference README.md:3-5;
the text bank is built from arbitrary names at
seg_segmentation/evaluation/builder.py:46-79).  From scratch, held-out
*words* are untestable (no pretrained language prior), but held-out
*compositions* of seen words are: train with a fixed set of color×shape
pairs excluded from every image and caption (`prepare_data shapes
--holdout`), then probe a checkpoint on the per-pair split
(procgen.write_pair_eval_split) two ways:

  (a) standard shape-name bank — per-class IoU on images whose pair was
      HELD OUT of training vs images of the same shape in SEEN colors
      (within-class comparison: "does 'triangle' still segment red
      triangles when no red triangle was ever trained on?");
  (b) attribute-COMPOSED queries — a text bank of "{color} {shape}" names
      through the unchanged template machinery; GT remapped per image to
      its pair id ("does the model localize 'a photo of a red triangle.'
      it never saw?").

Usage (chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/holdout_study.py \
        --ckpt /root/runH/ckpt_epoch_3 --data-root /root/shapes60k_holdout
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_manifests(data_root: str):
    with open(os.path.join(data_root, "holdout.json")) as f:
        holdout = {tuple(p) for p in json.load(f)["holdout_pairs"]}
    with open(os.path.join(data_root, "pair_eval", "pairs.json")) as f:
        pairs = json.load(f)
    return holdout, pairs


def eval_standard_bank(segmenter, dataset, pairs, holdout, spec):
    """(a): shape-name bank, meters split by held-out vs seen pair."""
    from segclip_tpu.evalseg.miou import MIoUMeter
    meters = {"held_out": MIoUMeter(segmenter.num_classes,
                                    spec.ignore_index),
              "seen": MIoUMeter(segmenter.num_classes, spec.ignore_index)}
    for s in dataset:
        p = pairs[s.name]
        pred = segmenter.predict(s.image, s.orig_shape)
        key = ("held_out" if (p["color"], p["shape"]) in holdout
               else "seen")
        meters[key].update(pred, s.label)
    return {k: m.results(spec.classes) for k, m in meters.items()}


def eval_composed_bank(model, params, cfg, dataset, pairs, holdout, spec,
                       template_set: str = "simple"):
    """(b): one bank over every '{color} {shape}' name; per-image GT is the
    binary shape mask remapped to that image's pair id."""
    from segclip_tpu.data.procgen import COLORS, SHAPE_CLASSES
    from segclip_tpu.evalseg.inference import ZeroShotSegmenter
    from segclip_tpu.evalseg.miou import MIoUMeter
    from segclip_tpu.evalseg.text_bank import build_text_bank

    pair_names = [f"{c} {k}" for k in SHAPE_CLASSES for c in COLORS]
    # keyed (color, shape) like the manifests; 0 is background
    pair_id = {(n.split(" ", 1)[0], n.split(" ", 1)[1]): i + 1
               for i, n in enumerate(pair_names)}
    bank = build_text_bank(model, params, pair_names, template_set,
                           context_length=cfg.context_length)
    seg = ZeroShotSegmenter(model, params, bank, with_bg=True,
                            bg_thresh=spec.bg_thresh,
                            patch_size=cfg.vision_patch_size)
    meters = {"held_out": MIoUMeter(seg.num_classes, spec.ignore_index),
              "seen": MIoUMeter(seg.num_classes, spec.ignore_index)}
    per_pair = {}
    for s in dataset:
        p = pairs[s.name]
        pid = pair_id[(p["color"], p["shape"])]
        label = np.where(s.label > 0, pid, 0).astype(s.label.dtype)
        pred = seg.predict(s.image, s.orig_shape)
        key = ("held_out" if (p["color"], p["shape"]) in holdout
               else "seen")
        meters[key].update(pred, label)
        m = per_pair.setdefault((p["color"], p["shape"]),
                                MIoUMeter(seg.num_classes,
                                          spec.ignore_index))
        m.update(pred, label)
    names = ["background"] + pair_names
    out = {k: m.results(names) for k, m in meters.items()}
    out["per_pair_iou"] = {
        f"{c} {k}": (None if np.isnan(v) else round(float(v), 2))
        for (c, k), m in sorted(per_pair.items())
        for v in [m.results()["IoU"][pair_id[(c, k)]]]}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data-root", required=True,
                    help="corpus dir with holdout.json and pair_eval/")
    ap.add_argument("--template", default="simple")
    ap.add_argument("--out", default=None, help="write the JSON here too")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="ModelConfig overrides key=value")
    args = ap.parse_args()

    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from segclip_tpu.cli.common import load_model
    from segclip_tpu.cli.eval_zeroshot import build_segmenter
    from segclip_tpu.config import ModelConfig, apply_overrides
    from segclip_tpu.evalseg.datasets import DATASET_SPECS, SegEvalDataset

    holdout, pairs = load_manifests(args.data_root)
    cfg = ModelConfig(use_vision_mae_recon=True, use_seglabel=True,
                      gumbel_tau=3.0, group_balance_weight=1.0)
    cfg = apply_overrides(cfg, args.opts)
    model, params, cfg = load_model(args.ckpt, cfg)
    spec = DATASET_SPECS["shapes"]
    dataset = SegEvalDataset(spec, os.path.join(args.data_root,
                                                "pair_eval"))
    print(f"{len(dataset)} probe images, holdout={sorted(holdout)}")

    segmenter = build_segmenter(model, params, cfg, spec,
                                template_set=args.template)
    std = eval_standard_bank(segmenter, dataset, pairs, holdout, spec)
    composed = eval_composed_bank(model, params, cfg, dataset, pairs,
                                  holdout, spec,
                                  template_set=args.template)

    report = {"holdout_pairs": sorted(map(list, holdout)),
              "standard_bank": {k: {"mIoU": v["mIoU"], "mAcc": v["mAcc"],
                                    "per_class": v.get("per_class")}
                                for k, v in std.items()},
              "composed_bank": {k: {"mIoU": composed[k]["mIoU"],
                                    "mAcc": composed[k]["mAcc"]}
                                for k in ("held_out", "seen")},
              "composed_per_pair_iou": composed["per_pair_iou"]}
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
