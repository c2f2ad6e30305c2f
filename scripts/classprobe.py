"""Image-level grounding probe: does the POOLED feature know each class?

The zero-shot seg eval exercises the SPATIAL pathway (group tokens →
patch attn → text match), but sim_loss trains the POOLED image/text
features (models/segclip.py info_nce_pair; reference modeling.py:338-362).
The single-winner regime (one shape class grounds spatially, the rest
score 0 — docs/PERF.md runs 8/E/P/Q) has two candidate mechanisms:

  (a) the CONTRASTIVE optimum itself is single-feature: only one class
      separates image/text pairs even at the pooled level;
  (b) pooled features ground MULTIPLE classes, but the spatial
      grouping/attn pathway bottlenecks which of them segments.

This probe separates them with no training: per shape class, the ROC-AUC
of sim(text "a photo of a {shape}.", pooled image feature) against the
class's GT presence in the image (eval-split masks). AUC ≈ 0.5 for all
but the winner → (a); AUC high for several classes → (b), and the next
lever is the seg pathway, not the objective.

Usage (chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/classprobe.py \
        --ckpt /root/runQ/ckpt_best --data-root /root/shapes24k_monly_h6 \
        [--out docs/artifacts/runQ_classprobe.json]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based ROC-AUC (Mann-Whitney U)."""
    pos, neg = scores[labels], scores[~labels]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    ranks = np.argsort(np.argsort(np.concatenate([pos, neg]))) + 1
    u = ranks[:len(pos)].sum() - len(pos) * (len(pos) + 1) / 2
    return float(u / (len(pos) * len(neg)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data-root", required=True,
                    help="corpus dir with an eval/ VOC-layout split")
    ap.add_argument("--template", default="simple")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default=None)
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()

    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    from segclip_tpu.cli.common import load_model
    from segclip_tpu.config import ModelConfig, apply_overrides
    from segclip_tpu.data.procgen import SHAPE_CLASSES
    from segclip_tpu.evalseg.datasets import DATASET_SPECS, SegEvalDataset
    from segclip_tpu.evalseg.text_bank import build_text_bank

    cfg = ModelConfig(use_vision_mae_recon=True, use_seglabel=True,
                      gumbel_tau=3.0, group_balance_weight=1.0)
    cfg = apply_overrides(cfg, args.opts)
    model, params, cfg = load_model(args.ckpt, cfg)
    spec = DATASET_SPECS["shapes"]
    dataset = SegEvalDataset(spec, os.path.join(args.data_root, "eval"))

    bank = build_text_bank(model, params, list(SHAPE_CLASSES),
                           args.template, context_length=cfg.context_length)

    res = cfg.image_resolution

    @jax.jit
    def encode(p, imgs):
        v = model.apply({"params": p}, imgs,
                        method=lambda m, x: m.clip.encode_image(
                            x, training=False)).pooled
        v = v.astype(jnp.float32)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    sims, present = [], []
    buf_img, buf_lbl = [], []

    def flush():
        if not buf_img:
            return
        batch = jnp.asarray(np.stack(buf_img))
        v = np.asarray(encode(params, batch))
        sims.append(v @ np.asarray(bank).T)          # (b, 6)
        present.extend(buf_lbl)
        buf_img.clear()
        buf_lbl.clear()

    for s in dataset:
        # SegEvalSample.image is already CLIP-normalized float32 with
        # short side 224 (evalseg/datasets.py) — center-crop to res².
        arr = s.image
        h, w = arr.shape[:2]
        top, left = max((h - res) // 2, 0), max((w - res) // 2, 0)
        arr = arr[top:top + res, left:left + res]
        if arr.shape[:2] != (res, res):      # short side < res (non-224 arch)
            pad = np.zeros((res, res, 3), np.float32)
            pad[:arr.shape[0], :arr.shape[1]] = arr
            arr = pad
        buf_img.append(arr)
        ids = set(np.unique(s.label).tolist())
        buf_lbl.append([(k + 1) in ids for k in range(len(SHAPE_CLASSES))])
        if len(buf_img) == args.batch:
            flush()
    flush()

    sims = np.concatenate(sims)                      # (N, 6)
    present = np.asarray(present)                    # (N, 6) bool
    report = {"ckpt": args.ckpt, "n_images": int(sims.shape[0]),
              "per_class": {}}
    for k, name in enumerate(SHAPE_CLASSES):
        sc, lb = sims[:, k], present[:, k]
        report["per_class"][name] = {
            "auc": round(auc(sc, lb), 4),
            "n_present": int(lb.sum()),
            "mean_sim_present": round(float(sc[lb].mean()), 4),
            "mean_sim_absent": round(float(sc[~lb].mean()), 4),
        }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
