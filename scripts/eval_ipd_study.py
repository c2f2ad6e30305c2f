"""Quantify `--images-per-device` batched eval vs the sequential default.

VERDICT r2 item 5: the +50% batched eval path (`images_per_device=4`) ships
off-by-default because borderline argmax pixels can flip under the
bf16 accumulation-order change that vmap introduces — but the actual mIoU
delta was never measured on-chip. This study runs BOTH paths over the full
mixed-shape shapes eval set (300 images, 224-288 px sides, trained
checkpoint so predictions are meaningful, not random-weight argmax noise)
and reports:

  - mIoU / mAcc / aAcc per path
  - fraction of evaluated pixels whose argmax flipped between paths
  - steady-state img/s per path (2nd pass timed; 1st pass pays compiles)

Decision rule (VERDICT): |dmIoU| <= 0.05 -> flip the default to 4 on TPU.

Usage (chip must be otherwise idle):
    python scripts/eval_ipd_study.py --ckpt /root/run5/ckpt_epoch_9 \
        --data-root /root/shapes_data/eval
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def collect_sequential(segmenter, dataset):
    preds = {}
    t0 = time.perf_counter()
    for i, s in enumerate(dataset):
        preds[i] = segmenter.predict(s.image, s.orig_shape)
    return preds, time.perf_counter() - t0


def collect_batched(segmenter, dataset, mesh, ipd: int):
    """evaluate_dataset_sharded's grouping loop, keeping per-image preds."""
    n_images = ipd  # single-device study
    preds = {}
    groups: dict = {}
    t0 = time.perf_counter()

    def flush(key, group):
        n_real = len(group)
        while len(group) < n_images:
            group.append(group[-1])
        stacked = [np.stack([g[0][k] for g in group]) for k in range(8)]
        fn = segmenter._slide_predict_batch(mesh, n_images, *key)
        out = np.asarray(fn(segmenter.params, stacked[0],
                            segmenter.text_bank, *stacked[1:]))
        for (args, idx, (oh, ow)), p in list(zip(group, out))[:n_real]:
            preds[idx] = p[:oh, :ow]

    for i, s in enumerate(dataset):
        key, args = segmenter._slide_inputs(s.image, s.orig_shape)
        groups.setdefault(key, []).append((args, i, s.orig_shape))
        if len(groups[key]) == n_images:
            flush(key, groups.pop(key))
    for key in sorted(groups):
        flush(key, groups.pop(key))
    return preds, time.perf_counter() - t0


def miou_of(preds, dataset, num_classes):
    from segclip_tpu.evalseg.miou import MIoUMeter
    meter = MIoUMeter(num_classes, ignore_index=dataset.spec.ignore_index)
    for i, s in enumerate(dataset):
        if s.label is not None:
            meter.update(preds[i], s.label)
    return meter.results(dataset.spec.classes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="Orbax params dir; omit for random init (harsher "
                         "determinism test: near-uniform affinities maximize "
                         "near-tie argmax pixels)")
    ap.add_argument("--data-root", default="/root/shapes_data/eval")
    ap.add_argument("--dataset", default="shapes")
    ap.add_argument("--ipd", type=int, default=4)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="model.compute_dtype for the eval encode — float32 "
                         "is the reference's eval precision (amp O0, "
                         "seg_segmentation/default.yml:2)")
    ap.add_argument("--matmul-precision", default=None,
                    choices=["default", "highest"],
                    help="TPU dot precision for the study graphs, mirroring "
                         "eval_zeroshot: defaults to 'highest' at --dtype "
                         "float32 (the deterministic mode PERF.md's table "
                         "measured), else 'default'")
    args = ap.parse_args()

    from segclip_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from segclip_tpu.cli.common import load_model
    from segclip_tpu.cli.eval_zeroshot import build_segmenter
    from segclip_tpu.config import ModelConfig
    from segclip_tpu.evalseg.datasets import DATASET_SPECS, SegEvalDataset
    from segclip_tpu.parallel.mesh import make_mesh

    cfg = ModelConfig(use_vision_mae_recon=True, use_seglabel=True,
                      gumbel_tau=3.0, group_balance_weight=1.0,
                      compute_dtype=args.dtype)
    model, params, cfg = load_model(args.ckpt, cfg)
    spec = DATASET_SPECS[args.dataset]
    precision = args.matmul_precision or (
        "highest" if args.dtype == "float32" else "default")
    import contextlib
    import jax
    prec_ctx = (jax.default_matmul_precision("highest")
                if precision == "highest" else contextlib.nullcontext())
    dataset = SegEvalDataset(spec, args.data_root, limit=args.limit)
    mesh = make_mesh()
    print(f"{len(dataset)} images, ipd comparison 1 vs {args.ipd} "
          f"(dtype={args.dtype}, matmul={precision})")

    with prec_ctx:
        segmenter = build_segmenter(model, params, cfg, spec)
        # pass 1 compiles, pass 2 is the timed steady state; preds identical
        collect_sequential(segmenter, dataset)
        preds_seq, dt_seq = collect_sequential(segmenter, dataset)
        collect_batched(segmenter, dataset, mesh, args.ipd)
        preds_b, dt_b = collect_batched(segmenter, dataset, mesh, args.ipd)

    r_seq = miou_of(preds_seq, dataset, segmenter.num_classes)
    r_b = miou_of(preds_b, dataset, segmenter.num_classes)

    flipped = total = 0
    for i in preds_seq:
        a, b = preds_seq[i], preds_b[i]
        assert a.shape == b.shape, (i, a.shape, b.shape)
        flipped += int((a != b).sum())
        total += a.size
    out = {
        "n_images": len(dataset),
        "seq": {"mIoU": r_seq["mIoU"], "mAcc": r_seq["mAcc"],
                "aAcc": r_seq["aAcc"],
                "img_s": round(len(dataset) / dt_seq, 2)},
        f"ipd{args.ipd}": {"mIoU": r_b["mIoU"], "mAcc": r_b["mAcc"],
                           "aAcc": r_b["aAcc"],
                           "img_s": round(len(dataset) / dt_b, 2)},
        "d_miou": round(r_b["mIoU"] - r_seq["mIoU"], 4),
        "flipped_pixel_frac": round(flipped / max(total, 1), 8),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
