"""Batch false-negative statistics for the mention-caption corpus (the
run-N diagnosis, VERDICT r4 #1).

Run N (docs/PERF.md) trained on `--captions mention` and LOST grounding
(mIoU 12.5 -> 11.75, best = epoch 0).  Hypothesis: a mention caption
("a photo of a circle.") truthfully describes EVERY batch image containing
a circle — scenes hold 1-3 of 6 shapes, so a large fraction of each batch
are true matches — and the one-label InfoNCE (models/segclip.py
rank-offset labels; reference modeling.py:205-209) treats all of them as
negatives.  The gradient then actively pushes the caption's text feature
AWAY from correct visual features: worse caption structure, not better.

This script measures that mechanically, host-side, with no training: it
replays the EXACT batch composition of a run (ShardedEpochSampler, same
seed/batch), derives each image's scene content from its color-full
caption (the generator enumerates every placed shape in caption 0), and
counts per-row truthful matches ("false negatives" under one-label CE).

Usage:
  PYTHONPATH=/root/repo python scripts/mention_stats.py \
      --data-root /root/shapes24k_ment_holdout [--batch-size 96] \
      [--epochs 2] [--out docs/artifacts/mention_stats.json]
"""
from __future__ import annotations

import argparse
import json
import os
import re

import numpy as np

from segclip_tpu.data.procgen import COLORS, SHAPE_CLASSES
from segclip_tpu.data.records import SgrReader
from segclip_tpu.data.pipeline import ShardedEpochSampler

_PAIR_RE = re.compile(
    r"\b(?:(%s)\s+)?(%s)\b" % ("|".join(COLORS), "|".join(SHAPE_CLASSES)))


def parse_pairs(caption: str):
    """[(color|None, shape), ...] mentioned in a generated caption."""
    return [(m.group(1), m.group(2)) for m in _PAIR_RE.finditer(caption)]


def load_samples(data_root: str, name: str = "shapes"):
    """Flatten the captions shard into the dataset's sample order
    (PairRecordDataset: one sample per (image, caption) pair) and derive
    per-image scene content from caption 0 (the color-full caption names
    every placed shape — procgen._scene_with_captions)."""
    reader = SgrReader(os.path.join(data_root, f"{name}_captions.sgr"))
    samples = []          # (img_index, cap_index, mentioned_pairs)
    scenes = []           # per image: set of (color, shape) placed
    for i in range(len(reader)):
        _, payload = reader.record(i)
        obj = json.loads(payload)
        caps = obj["caps"] if isinstance(obj, dict) else obj
        scene = set(parse_pairs(caps[0]))
        assert all(c is not None for c, _ in scene), caps[0]
        scenes.append(scene)
        for c_i, cap in enumerate(caps):
            samples.append((i, c_i, parse_pairs(cap)))
    return samples, scenes


def row_kind(cap_index: int, pairs) -> str:
    if cap_index == 0:
        return "full"
    return "mention_color" if pairs[0][0] is not None else "mention_plain"


def truthful_matches(pairs, scene) -> bool:
    """Does a caption mentioning `pairs` truthfully describe `scene`?
    Color-bearing mentions require the exact (color, shape) pair; plain
    mentions any color of the shape; full captions every mentioned pair."""
    for color, shape in pairs:
        if color is None:
            if not any(s == shape for _, s in scene):
                return False
        elif (color, shape) not in scene:
            return False
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--name", default="shapes")
    ap.add_argument("--batch-size", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    samples, scenes = load_samples(args.data_root, args.name)
    sampler = ShardedEpochSampler(len(samples), args.batch_size,
                                  seed=args.seed)

    kinds = ("mention_plain", "mention_color", "full")
    # masked_*: accounting under model.infonce_mask="class", which drops
    # every column whose IMAGE contains the caption's NAMED class
    # (class-granular — a color mention masks same-shape columns of ANY
    # color).  residual_fn = truthful matches the mask does NOT remove
    # (for mention rows 0 by construction; full-caption rows are
    # text_class=0 and keep all theirs); overmask = masked columns that
    # were TRUE negatives (same shape, wrong color under a color mention).
    stats = {k: {"rows": 0, "fn_total": 0, "rows_ge1": 0,
                 "masked_total": 0, "residual_fn_total": 0,
                 "overmask_total": 0} for k in kinds}
    per_shape = {s: {"rows": 0, "fn_total": 0} for s in SHAPE_CLASSES}
    p_contains = {s: np.mean([any(sh == s for _, sh in sc)
                              for sc in scenes]) for s in SHAPE_CLASSES}

    for epoch in range(args.epochs):
        for batch_idx in sampler.epoch_indices(epoch):
            imgs = [samples[i][0] for i in batch_idx]
            for slot, si in enumerate(batch_idx):
                img_i, cap_i, pairs = samples[si]
                kind = row_kind(cap_i, pairs)
                # columns j != own slot whose IMAGE the caption truthfully
                # describes = false negatives under one-label CE
                fn = masked = residual = overmask = 0
                named = pairs[0][1] if kind.startswith("mention") else None
                for j, img_j in enumerate(imgs):
                    if j == slot:
                        continue
                    truthful = truthful_matches(pairs, scenes[img_j])
                    fn += truthful
                    is_masked = (named is not None and
                                 any(s == named for _, s in scenes[img_j]))
                    masked += is_masked
                    residual += truthful and not is_masked
                    overmask += is_masked and not truthful
                st = stats[kind]
                st["rows"] += 1
                st["fn_total"] += fn
                st["rows_ge1"] += fn >= 1
                st["masked_total"] += masked
                st["residual_fn_total"] += residual
                st["overmask_total"] += overmask
                if kind.startswith("mention"):
                    ps = per_shape[pairs[0][1]]
                    ps["rows"] += 1
                    ps["fn_total"] += fn

    def summarize(st):
        r = max(st["rows"], 1)
        return {"rows": st["rows"],
                "mean_false_negatives": round(st["fn_total"] / r, 2),
                "frac_rows_with_fn": round(st["rows_ge1"] / r, 4),
                "mean_masked_columns": round(st["masked_total"] / r, 2),
                "mean_residual_fn_under_mask":
                    round(st["residual_fn_total"] / r, 2),
                "mean_overmasked_true_negatives":
                    round(st["overmask_total"] / r, 2)}

    report = {
        "data_root": args.data_root,
        "batch_size": args.batch_size,
        "epochs_sampled": args.epochs,
        "n_samples": len(samples),
        "n_images": len(scenes),
        "p_image_contains_shape": {k: round(float(v), 4)
                                   for k, v in p_contains.items()},
        "per_row_kind": {k: summarize(v) for k, v in stats.items()},
        "mention_per_shape_mean_fn": {
            s: round(v["fn_total"] / max(v["rows"], 1), 2)
            for s, v in per_shape.items()},
    }
    # the quantity the objective actually feels: a mention row with F
    # truthful matches has an IRREDUCIBLE CE of log(1+F) — the model
    # cannot reach low loss by grounding the class, only by keying on
    # features that separate duplicates (background, jitter, layout)
    mp = stats["mention_plain"]
    if mp["rows"]:
        f = mp["fn_total"] / mp["rows"]
        report["mention_plain_irreducible_ce"] = round(float(np.log(1 + f)),
                                                       3)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
