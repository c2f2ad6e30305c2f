"""Offline data preparation (preprocess/{COCO,GCC3M} equivalents).

Subcommands:
  pack        images + captions → <name>_images.sgr / <name>_captions.sgr
              (replaces write_coco_images.py / generate_lmdb_from_pickles.py:
              images resized so the short side is 224 and re-encoded JPEG)
  superpixels compute Felzenszwalb maps over an images shard →
              <name>_seg.sgr (replaces felzenszwalb_extraction_*.py;
              scale=224 sigma=0.9 min_size=224)

Caption sources for `pack`:
  --captions-json  {"image_key": ["caption", ...], ...}
  --karpathy-json  Karpathy-split dataset_coco.json (images[].sentences[])
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys

import numpy as np
from PIL import Image

from segclip_tpu.data.records import SgrReader, SgrWriter
from segclip_tpu.data.superpixel import encode_seg_map, felzenszwalb
from segclip_tpu.utils.logging import get_logger


def resize_short_side(img: Image.Image, short: int = 224) -> Image.Image:
    w, h = img.size
    if min(w, h) <= short:
        return img
    s = short / min(w, h)
    return img.resize((int(round(w * s)), int(round(h * s))), Image.BICUBIC)


def load_captions(args) -> dict:
    if args.captions_json:
        with open(args.captions_json) as f:
            caps = json.load(f)
        return {k: (v if isinstance(v, list) else [v])
                for k, v in caps.items()}
    if args.karpathy_json:
        with open(args.karpathy_json) as f:
            data = json.load(f)
        out = {}
        for img in data["images"]:
            if args.karpathy_split and img.get("split") != args.karpathy_split:
                continue
            key = img["filename"]
            out[key] = [s["raw"] for s in img["sentences"]]
        return out
    raise SystemExit("pack needs --captions-json or --karpathy-json")


def cmd_pack(args):
    logger = get_logger()
    captions = load_captions(args)
    out_img = os.path.join(args.out_dir, f"{args.name}_images.sgr")
    out_cap = os.path.join(args.out_dir, f"{args.name}_captions.sgr")

    n_ok, n_missing = 0, 0
    with SgrWriter(out_img) as wi, SgrWriter(out_cap) as wc:
        for key, caps in sorted(captions.items()):
            path = os.path.join(args.image_dir, key)
            if not os.path.exists(path):
                n_missing += 1
                continue
            try:
                img = Image.open(path).convert("RGB")
                img = resize_short_side(img, args.short_side)
                buf = io.BytesIO()
                img.save(buf, format="JPEG", quality=args.quality)
                wi.add(key, buf.getvalue())
                wc.add(key, json.dumps(caps).encode())
                n_ok += 1
            except Exception as e:
                logger.warning("skip %s: %s", key, e)
            if n_ok % 1000 == 0 and n_ok:
                logger.info("packed %d images", n_ok)
    logger.info("done: %d packed, %d missing → %s", n_ok, n_missing, out_img)


def cmd_pack_tars(args):
    """webdataset-style tar shards (xxx.jpg + xxx.txt members) → SGR shards
    (preprocess/GCC3M/extraxt_images_from_tar.py + generate_lmdb_from_pickles
    equivalents, collapsed into one pass)."""
    import glob
    import tarfile
    logger = get_logger()
    out_img = os.path.join(args.out_dir, f"{args.name}_images.sgr")
    out_cap = os.path.join(args.out_dir, f"{args.name}_captions.sgr")
    tars = sorted(glob.glob(os.path.join(args.tar_dir, "*.tar")))
    if not tars:
        raise SystemExit(f"no .tar files under {args.tar_dir}")
    n_ok, n_bad = 0, 0
    with SgrWriter(out_img) as wi, SgrWriter(out_cap) as wc:
        for tar_path in tars:
            pending: dict = {}
            with tarfile.open(tar_path) as tf:
                for member in tf:
                    if not member.isfile():
                        continue
                    stem, ext = os.path.splitext(member.name)
                    if ext not in (".jpg", ".jpeg", ".png", ".txt"):
                        continue
                    data = tf.extractfile(member).read()
                    slot = pending.setdefault(stem, {})
                    slot["caption" if ext == ".txt" else "image"] = data
                    if "caption" in slot and "image" in slot:
                        try:
                            img = Image.open(io.BytesIO(slot["image"]))
                            img = resize_short_side(img.convert("RGB"),
                                                    args.short_side)
                            buf = io.BytesIO()
                            img.save(buf, format="JPEG",
                                     quality=args.quality)
                            key = f"{os.path.basename(tar_path)}/{stem}"
                            wi.add(key, buf.getvalue())
                            caption = slot["caption"].decode(
                                "utf-8", errors="replace").strip()
                            wc.add(key, json.dumps([caption]).encode())
                            n_ok += 1
                        except Exception as e:
                            n_bad += 1
                            logger.warning("skip %s: %s", stem, e)
                        del pending[stem]
            if pending:
                n_bad += len(pending)
                logger.warning("%s: %d unpaired members dropped",
                               os.path.basename(tar_path), len(pending))
            logger.info("%s done (%d packed, %d bad so far)",
                        os.path.basename(tar_path), n_ok, n_bad)
    logger.info("packed %d pairs → %s", n_ok, out_img)


def cmd_superpixels(args):
    logger = get_logger()
    images = SgrReader(os.path.join(args.data_dir,
                                    f"{args.name}_images.sgr"))
    out = os.path.join(args.data_dir, f"{args.name}_seg.sgr")
    with SgrWriter(out) as w:
        for i in range(len(images)):
            key, jpeg = images.record(i)
            img = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"))
            labels = felzenszwalb(img, scale=args.scale, sigma=args.sigma,
                                  min_size=args.min_size)
            w.add(key, encode_seg_map(labels))
            if (i + 1) % 500 == 0:
                logger.info("superpixels %d/%d", i + 1, len(images))
    logger.info("wrote %s", out)


# COCO-Stuff 0-indexed labelmap ids that are absent among the 91 thing slots
# (the 11 COCO category ids never annotated); the remaining 80 thing ids map
# to trainIds 1..80, stuff (>90) and unlabeled (255) map to background 0 —
# the reference's clsID_to_trID table + shift
# (preprocess/COCO/convert_coco_object4val.py:26-206) generated
# programmatically.
_COCO_MISSING_THING_IDS = {11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90}


def coco_object_trainid_table() -> np.ndarray:
    table = np.zeros(256, np.uint8)           # default: background 0
    next_tr = 1
    for cls in range(91):
        if cls in _COCO_MISSING_THING_IDS:
            continue
        table[cls] = next_tr
        next_tr += 1
    assert next_tr == 81
    return table


def cmd_coco_gt(args):
    """COCO-Stuff val2017 labelmaps → 81-class *_instanceTrainIds.png."""
    import glob
    logger = get_logger()
    ann_dir = os.path.join(args.coco_path, "annotations", "val2017")
    out_dir = os.path.join(args.out_dir or args.coco_path, "annotations",
                           "val2017")
    os.makedirs(out_dir, exist_ok=True)
    table = coco_object_trainid_table()
    files = [f for f in glob.glob(os.path.join(ann_dir, "*.png"))
             if "TrainIds" not in f]
    for i, path in enumerate(sorted(files)):
        mask = np.asarray(Image.open(path))
        out = table[mask]
        stem = os.path.basename(path).split(".")[0]
        Image.fromarray(out).save(
            os.path.join(out_dir, f"{stem}_instanceTrainIds.png"), "PNG")
        if (i + 1) % 1000 == 0:
            logger.info("converted %d/%d", i + 1, len(files))
    logger.info("converted %d masks → %s", len(files), out_dir)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pack")
    p.add_argument("--name", required=True)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--captions-json", default=None)
    p.add_argument("--karpathy-json", default=None)
    p.add_argument("--karpathy-split", default=None,
                   help="train/val/test filter for Karpathy json")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--short-side", type=int, default=224)
    p.add_argument("--quality", type=int, default=90)
    p.set_defaults(fn=cmd_pack)

    p = sub.add_parser("pack-tars")
    p.add_argument("--name", required=True)
    p.add_argument("--tar-dir", required=True,
                   help="directory of webdataset .tar shards")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--short-side", type=int, default=224)
    p.add_argument("--quality", type=int, default=90)
    p.set_defaults(fn=cmd_pack_tars)

    p = sub.add_parser("superpixels")
    p.add_argument("--name", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--scale", type=float, default=224.0)
    p.add_argument("--sigma", type=float, default=0.9)
    p.add_argument("--min-size", type=int, default=224)
    p.set_defaults(fn=cmd_superpixels)

    p = sub.add_parser("coco-gt")
    p.add_argument("--coco-path", required=True,
                   help="coco_stuff164k root with annotations/val2017")
    p.add_argument("--out-dir", default=None)
    p.set_defaults(fn=cmd_coco_gt)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
