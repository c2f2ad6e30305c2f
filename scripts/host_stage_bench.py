"""Per-stage host pipeline cost (ms/sample) for the transfer modes.

Measures, on one batch worth of samples from a packed SGR corpus:
  decode(RGB) / decode(YCbCr-native) / crop-resize RGB / crop-resize YUV /
  numpy rgb_to_yuv420 / superpixel crop / tokenize / full sample() per mode.

Usage: python scripts/host_stage_bench.py <corpus_dir> [n]
"""
import sys
import time

import numpy as np


def timeit(fn, n):
    t0 = time.perf_counter()
    for i in range(n):
        fn(i)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    corpus = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    from segclip_tpu.data.pipeline import PairRecordDataset, _decode_jpeg
    from segclip_tpu.data.superpixel import crop_seg_from_cache, decode_seg_map
    from segclip_tpu.data.transforms import (random_resized_crop_coord,
                                             random_resized_crop_yuv420,
                                             rgb_to_yuv420)
    from segclip_tpu.data.tokenizer import tokenize_with_mask
    import json as _json

    name = None
    import os
    for f in os.listdir(corpus):
        if f.endswith("_images.sgr"):
            name = f[:-len("_images.sgr")]
    assert name, f"no *_images.sgr in {corpus}"

    ds = PairRecordDataset(name, corpus, use_seg=True, normalize=False)
    keys = ds._keys[:n]
    jpegs = [ds.images.get(k) for k in keys]
    segs = [ds.seg.get(k) for k in keys]
    caps = [_json.loads(ds.captions.get(k))[0] for k in keys]

    out = {}
    out["decode_rgb"] = timeit(lambda i: _decode_jpeg(jpegs[i], False), n)
    out["decode_ycbcr"] = timeit(
        lambda i: _decode_jpeg(jpegs[i], False, mode="YCbCr").load(), n)
    imgs_rgb = [_decode_jpeg(j, False) for j in jpegs]
    imgs_yuv = [_decode_jpeg(j, False, mode="YCbCr") for j in jpegs]
    for im in imgs_yuv:
        im.load()
    out["crop_resize_rgb"] = timeit(
        lambda i: random_resized_crop_coord(
            imgs_rgb[i], 224, np.random.default_rng(i)), n)
    out["crop_resize_yuv420"] = timeit(
        lambda i: random_resized_crop_yuv420(
            imgs_yuv[i], 224, np.random.default_rng(i)), n)
    arrs = [random_resized_crop_coord(im, 224, np.random.default_rng(3))[0]
            for im in imgs_rgb]
    out["np_rgb_to_yuv420"] = timeit(lambda i: rgb_to_yuv420(arrs[i]), n)
    segmaps = [decode_seg_map(s) for s in segs]
    coord = random_resized_crop_coord(imgs_rgb[0], 224,
                                      np.random.default_rng(3))[1]
    out["seg_decode"] = timeit(lambda i: decode_seg_map(segs[i]), n)
    out["seg_crop"] = timeit(
        lambda i: crop_seg_from_cache(segmaps[i], coord, 224, 16), n)
    out["tokenize"] = timeit(
        lambda i: tokenize_with_mask(ds.tokenizer, caps[i], 32), n)

    for mode in ("rgb", "yuv420"):
        d = PairRecordDataset(name, corpus, use_seg=True, normalize=False,
                              transfer=mode)
        out[f"sample_{mode}"] = timeit(
            lambda i: d.sample(i, np.random.default_rng(i)), n)

    for k, v in out.items():
        print(f"{k:24s} {v:7.3f} ms/sample")


if __name__ == "__main__":
    main()
